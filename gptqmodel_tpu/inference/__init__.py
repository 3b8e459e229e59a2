"""inference — KV-cache decode loop, generation, serving."""

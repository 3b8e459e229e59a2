"""models — module-tree DSL, arch specs, JAX forwards, loader/writer, facade."""

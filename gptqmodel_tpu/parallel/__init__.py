"""parallel — device mesh, sharding rules, distributed quantization/inference.

Replaces the reference's DeviceThreadPool + PCIe tensor moves (SURVEY §2.7)
with SPMD over a jax.sharding.Mesh: calibration data parallelism is a mesh
axis (Hessian merge = psum), tensor parallelism shards packed weights + KV
heads over ICI, and XLA GSPMD inserts the collectives.
"""

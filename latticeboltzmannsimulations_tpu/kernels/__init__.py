"""Pallas TPU kernels — the hand-scheduled performance path.

``pallas_pull`` is the TPU analogue of the reference's fastest backend, the
SoA tiled pull CUDA kernel (reference: ``MRTTiledPull.py:379-515``): one
fused memory pass per step (gather-stream + NEBB + macros + collide), the
distribution field resident in HBM and tiles staged through VMEM."""

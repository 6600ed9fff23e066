"""Pallas TPU kernels — the hand-scheduled performance path.

``pallas_pull`` is the TPU analogue of the reference's fastest backend, the
SoA tiled pull CUDA kernel (reference: ``MRTTiledPull.py:379-515``): one
fused memory pass per step (gather-stream + NEBB + macros + collide), the
distribution field resident in HBM and tiles staged through VMEM.
``pallas_pull_tblock`` adds K-steps-per-dispatch temporal blocking;
``pallas_pull_sharded`` / ``pallas_pull_tblock_sharded`` are the per-shard
multi-chip forms; ``pallas_push`` is the E10-parity push-scheme kernel
(halo recompute instead of scatter; reference: ``MRTTiledPush.py:347-470``)."""

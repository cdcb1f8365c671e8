"""Data pipelines.

TPU-first design: datasets that fit in HBM (MNIST tensors: ~190 MB; MSCOCO
fc features: ~930 MB) are uploaded to device once at startup; every batch is
a device-side gather by an index vector, so the per-generation host↔device
traffic is just the (F, B) int32 index array — replacing the reference's
per-worker pickled-minibatch transport through Redis
(reference: src/dist.py, src/captioning/dataloader.py).
"""

from .core import DeviceDataset, EpochSampler

__all__ = ["DeviceDataset", "EpochSampler"]

"""Device-mesh utilities: the TPU-native replacement for the reference's
torch.distributed/NCCL bootstrap (``train_mi_multimodal.py:27-49``)."""

from .mesh import create_mesh, shard_batch

__all__ = ["create_mesh", "shard_batch"]

"""Device-mesh and sharding helpers.

The reference is single-process / single-GPU (see SURVEY.md §2.9; reference
`train.py:17`, `sbatch_train.sh:2-4` — no torch.distributed anywhere). The
TPU-native distributed surface is therefore first-class *data parallelism*
plus a sharded retrieval gallery, expressed through `jax.sharding.Mesh` and
`NamedSharding` so XLA inserts the ICI collectives (psum for gradients,
all-gather / local-top-k-merge for retrieval). Beyond the reference,
:mod:`.tensor` adds a GSPMD tensor-parallel option (channel-sharded
parameters over a second ``model`` mesh axis).
"""

from art_sbir_tpu.parallel.mesh import (
    MeshSpec,
    batch_sharding,
    data_mesh,
    gallery_sharding,
    replicated,
    shard_batch,
    shard_or_replicate,
)
from art_sbir_tpu.parallel.tensor import (
    MODEL_AXIS,
    mesh_2d,
    tp_place,
    tp_shard_tree,
    tp_spec,
)

__all__ = [
    "MeshSpec",
    "data_mesh",
    "batch_sharding",
    "gallery_sharding",
    "replicated",
    "shard_batch",
    "shard_or_replicate",
    "MODEL_AXIS",
    "mesh_2d",
    "tp_place",
    "tp_shard_tree",
    "tp_spec",
]

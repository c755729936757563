from mixmogam_tpu.parallel.mesh import make_mesh, snp_sharding, replicated
from mixmogam_tpu.parallel.distributed import (
    distributed_kinship, distributed_emmax, distributed_train_step,
)

__all__ = ["make_mesh", "snp_sharding", "replicated", "distributed_kinship",
           "distributed_emmax", "distributed_train_step"]

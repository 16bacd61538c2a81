from .config import Config, register, get_registered, freeze_dict
from .mesh import MeshSpec, make_mesh, shard_batch, host_local_batch_slice
from .prng import PRNGSeq

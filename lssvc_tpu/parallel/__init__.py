from .mesh import make_mesh, replicate, shard_batch
from .scheduler import run_tasks

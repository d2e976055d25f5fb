from .mesh import create_mesh, local_mesh
from .sharding import (batch_sharding, infer_param_sharding, param_shardings,
                       replicate)

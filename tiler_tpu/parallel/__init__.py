from .mesh import make_mesh  # noqa: F401
from .knn import sharded_topk  # noqa: F401
from .kmeans import sharded_lloyd_step  # noqa: F401

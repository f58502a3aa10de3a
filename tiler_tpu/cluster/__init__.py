from .kmeans import kmeans, assign_nearest, kmeans_pp_init  # noqa: F401

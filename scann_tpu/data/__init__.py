from scann_tpu.data.structure import Structure  # noqa: F401
from scann_tpu.data.voronoi import compute_voronoi_neighbors, solid_angle  # noqa: F401

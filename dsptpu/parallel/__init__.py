from .mesh import make_mesh, default_mesh
from .ops import shard_fir, shard_fftfilt, shard_welch, shard_sosfilt

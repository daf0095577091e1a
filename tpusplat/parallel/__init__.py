from tpusplat.parallel.mesh import make_render_mesh
from tpusplat.parallel.sharded import render_sharded, sharded_train_step

__all__ = ["make_render_mesh", "render_sharded", "sharded_train_step"]

from tpusplat.io.ply import load_ply, save_ply
from tpusplat.io.synthetic import random_scene

__all__ = ["load_ply", "save_ply", "random_scene"]

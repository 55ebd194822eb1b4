from .mesh import make_mesh, pad_batch, sharded_decode_fn

__all__ = ["make_mesh", "pad_batch", "sharded_decode_fn"]

from data_compression_tpu.parallel.mesh import make_mesh, data_sharding
from data_compression_tpu.parallel.pipeline import (
    make_sharded_encode_step,
    make_sharded_decode_step,
    compress_sharded,
    decompress_sharded,
)

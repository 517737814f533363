from data_compression_tpu.utils.crc import crc32
from data_compression_tpu.utils.timer import Timer, measure_gbps

from .device_format import DeviceScs, build_device_scs
from .spmv_xla import spmv_flat, spmv_tiled

from .partition import seg_work_sharing
from .halo import HaloPlan, build_halo_plan

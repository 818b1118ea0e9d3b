from .partition import partition_precisions, ap_threshold_from_norm

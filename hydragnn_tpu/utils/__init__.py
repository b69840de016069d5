from hydragnn_tpu.utils.print_utils import print_distributed, setup_log, log, log0
from hydragnn_tpu.utils.tracer import tracer

from .logging_utils import get_logger
from .profiling import StepTimer, device_trace
from .registry import load_run_config, register_run, resolve_run
from .vis import batch_flow_to_image, flow_to_image, make_color_wheel

__all__ = [
    "get_logger",
    "StepTimer",
    "device_trace",
    "load_run_config",
    "register_run",
    "resolve_run",
    "batch_flow_to_image",
    "flow_to_image",
    "make_color_wheel",
]

from umnn_tpu.utils.logging import AverageMeter, MetricsWriter, get_logger
from umnn_tpu.utils.validity import ValidityReport, density_validity_report

__all__ = [
    "AverageMeter",
    "MetricsWriter",
    "ValidityReport",
    "density_validity_report",
    "get_logger",
]

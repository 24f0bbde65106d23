from umnn_tpu.utils.logging import AverageMeter, MetricsWriter, get_logger

__all__ = ["AverageMeter", "MetricsWriter", "get_logger"]

"""Shared utilities: logging, meters, structured metrics."""

from .logger import AverageMeter, MetricsWriter, Tee

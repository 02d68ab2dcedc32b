"""Metrics logger: running means + optional TensorBoard.

Mirrors reference dpvo/logger.py:8-57 (SUM_FREQ=100 running-mean prints,
TensorBoard scalars when available).
"""
from __future__ import annotations

SUM_FREQ = 100


class Logger:
    def __init__(self, name, scheduler=None):
        self.total_steps = 0
        self.running_loss = {}
        self.writer = None
        self.name = name
        self.scheduler = scheduler

    def _maybe_writer(self):
        if self.writer is None:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self.writer = SummaryWriter(
                    log_dir=f'runs/{self.name}')
            except Exception:
                self.writer = False
        return self.writer

    def _print_training_status(self):
        metrics_data = [self.running_loss[k] / SUM_FREQ
                        for k in sorted(self.running_loss.keys())]
        metrics_str = ('{:10.4f}, ' * len(metrics_data)).format(*metrics_data)
        print(f'[{self.name}  {self.total_steps + 1:6d}] {metrics_str}')

        w = self._maybe_writer()
        if w:
            for k in self.running_loss:
                w.add_scalar(k, self.running_loss[k] / SUM_FREQ,
                             self.total_steps)
                self.running_loss[k] = 0.0
        else:
            for k in self.running_loss:
                self.running_loss[k] = 0.0

    def push(self, metrics):
        for key in metrics:
            self.running_loss[key] = self.running_loss.get(key, 0.0) + \
                float(metrics[key])
        if self.total_steps % SUM_FREQ == SUM_FREQ - 1:
            self._print_training_status()
            self.running_loss = {}
        self.total_steps += 1

    def write_dict(self, results):
        w = self._maybe_writer()
        if w:
            for key in results:
                w.add_scalar(key, results[key], self.total_steps)

    def close(self):
        if self.writer:
            self.writer.close()

"""Tracing / profiling utilities (SURVEY.md §5 aux subsystem).

The reference has only hand-rolled wall-clock logging
(reference: src/daft_exprt/train.py:458-462, generate.py:384-397). Here:
JAX profiler trace capture, synchronized timed sections (axon-safe: fetches
a scalar rather than trusting block_until_ready), and an audio-seconds/s
throughput counter.
"""
import contextlib
import logging
import time

import jax
import jax.numpy as jnp

_logger = logging.getLogger(__name__)


@contextlib.contextmanager
def profiler_trace(log_dir):
    """Capture a JAX profiler trace viewable in TensorBoard/perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        _logger.info(f'profiler trace written to {log_dir}')


def synchronize(tree):
    """Reliably wait for device work producing ``tree`` (fetches a scalar —
    block_until_ready is asynchronous on some remote platforms)."""
    leaves = jax.tree_util.tree_leaves(tree)
    if not leaves:
        return
    acc = sum(jnp.sum(jnp.abs(jnp.ravel(leaf)[:1])) for leaf in leaves)
    float(acc)


@contextlib.contextmanager
def timed_section(name, results=None):
    """Wall-clock a section; caller must synchronize inside if it launches
    async device work."""
    start = time.perf_counter()
    yield
    elapsed = time.perf_counter() - start
    _logger.info(f'[{name}] {elapsed * 1000:.1f} ms')
    if results is not None:
        results[name] = elapsed


class ThroughputCounter:
    """Audio-seconds/s accounting across synthesis batches."""

    def __init__(self, hparams):
        self.hop = hparams.hop_length
        self.n_fft = hparams.filter_length
        self.sr = hparams.sampling_rate
        self.centered = hparams.centered
        self.audio_seconds = 0.0
        self.wall_seconds = 0.0

    def frames_to_seconds(self, n_frames):
        nb_samples = (n_frames - 1) * self.hop + self.n_fft
        if self.centered:
            nb_samples -= 2 * (self.n_fft // 2)
        return nb_samples / self.sr

    def add(self, n_frames_list, wall_seconds):
        self.audio_seconds += sum(self.frames_to_seconds(int(n))
                                  for n in n_frames_list)
        self.wall_seconds += wall_seconds

    @property
    def rate(self):
        return self.audio_seconds / max(self.wall_seconds, 1e-9)

    def report(self):
        _logger.info(f'{self.audio_seconds:.1f} audio-s in '
                     f'{self.wall_seconds:.1f}s -> {self.rate:.1f} '
                     f'audio-s/s (RTF {self.rate:.2f})')
        return self.rate

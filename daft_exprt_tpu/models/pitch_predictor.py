"""Mel → frame-level pitch CNN (used frozen for the pitch-consistency loss).

Architecture parity with the reference predictor
(reference: src/daft_exprt/layers/pitch_predictor.py:38-74): 4 conv layers
80→256→256→256→1 (k=3, same padding) with ReLU + BatchNorm + dropout between.
The reference parameterizes convs with weight_norm; our converter folds
g·v/||v|| into plain kernels at conversion time (inference-identical), and
training from scratch uses plain kernels (weight norm is a reparameterization
with no capability difference).
"""
import flax.linen as nn
import jax.numpy as jnp


class PitchPredictor(nn.Module):
    n_mel_channels: int = 80
    hidden_dim: int = 256
    kernel_size: int = 3
    dropout: float = 0.1

    @nn.compact
    def __call__(self, mel_specs, deterministic=True, use_running_average=True):
        """mel_specs: (B, n_mels, T) → (B, T) predicted log-pitch."""
        x = jnp.swapaxes(mel_specs, 1, 2)                # (B, T, n_mels)
        for i in range(3):
            x = nn.Conv(self.hidden_dim, (self.kernel_size,), padding='SAME',
                        name=f'conv_{i}')(x)
            x = nn.relu(x)
            x = nn.BatchNorm(use_running_average=use_running_average,
                             momentum=0.9, epsilon=1e-5, name=f'bn_{i}')(x)
            x = nn.Dropout(self.dropout, name=f'drop_{i}')(
                x, deterministic=deterministic)
        x = nn.Conv(1, (self.kernel_size,), padding='SAME', name='conv_out')(x)
        return x[..., 0]

"""daft_exprt_tpu — a TPU-native (JAX/XLA/Pallas) expressive TTS framework.

Re-implements the full capability surface of the Daft-Exprt accent-conversion
fork (reference: /root/reference, surveyed in SURVEY.md) with a TPU-first
design: static shapes + masking, functional flax modules, XLA collectives over
a device mesh for scaling, and on-device DSP (STFT/mel/energy as MXU matmuls).

Layout:
    text/      symbol tables, cleaners, number normalization (host, pure Python)
    frontend/  feature extraction: mel/energy/pitch/durations/markers/MFA
    ops/       JAX/Pallas compute kernels (mel-DFT, gaussian upsampling, GRL, ...)
    models/    acoustic model (DaftExprt), pitch predictor, HiFi-GAN, discriminators
    data/      dataset, collation, dynamic speaker stats, set creation, stats
    parallel/  mesh construction, sharded train/synthesis steps
    utils/     logging, plotting, multiprocessing helpers
"""

__version__ = '0.1.0'

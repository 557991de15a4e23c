"""Data-parallel synthesis scaling benchmark.

BASELINE.md target: synthesized audio-seconds/s at 1 chip / 1 host / N
hosts with ≥85% scaling efficiency. This harness jits the batched synthesis
step over data-parallel meshes of increasing size and reports audio-s/s and
efficiency per mesh. On a real pod slice run it under
``jax.distributed.initialize``; on a dev box `--virtual_cpu N` validates the
sharding on N virtual CPU devices (numbers are then *correctness* proxies,
not throughput).
"""
import argparse
import json
import os
import sys
import time

import numpy as np

PROJECT_ROOT = os.path.dirname(os.path.dirname(os.path.realpath(__file__)))
sys.path.insert(0, PROJECT_ROOT)


def main(args):
    if args.virtual_cpu:
        os.environ['XLA_FLAGS'] = (
            os.environ.get('XLA_FLAGS', '')
            + f' --xla_force_host_platform_device_count={args.virtual_cpu}'
        ).strip()
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from __graft_entry__ import _full_size_model, _make_batch
    from daft_exprt_tpu.models.hifigan import (
        generator_forward, init_generator_params)
    from daft_exprt_tpu.parallel.mesh import make_mesh

    devices = jax.devices('cpu') if args.virtual_cpu else jax.devices()
    hp, model = _full_size_model()
    per_device_batch, L, T = args.per_device_batch, 128, args.frames
    voc_params = init_generator_params(jax.random.PRNGKey(2))

    def pipeline(params, voc_params, b):
        mel = model.apply(
            {'params': params}, method=model.inference,
            symbols=b['symbols'], duration_preds=b['durations_float'],
            durations_int=b['durations_int'],
            energy_preds=b['symbols_energy'],
            pitch_preds=b['symbols_pitch'],
            input_lengths=b['input_lengths'],
            output_lengths=b['output_lengths'], n_frames=T,
            spk_embs=b['spk_embs'],
            accent_emb=b['spk_embs'][:, :model.hidden_dim],
            deterministic=True)['mel_preds']
        acc = jnp.float32(0.0)
        chunk = max(1, args.vocoder_chunk)
        for i in range(0, mel.shape[0], chunk):
            acc += jnp.sum(jnp.abs(generator_forward(
                voc_params, mel[i:i + chunk])))
        return acc

    results = []
    base_rate = None
    sizes = [s for s in args.mesh_sizes if s <= len(devices)]
    for n in sizes:
        mesh = make_mesh(n_data=n, n_model=1, devices=devices[:n])
        B = per_device_batch * n
        batch = _make_batch(hp, B, L, T)
        variables = model.init({'params': jax.random.PRNGKey(0),
                                'dropout': jax.random.PRNGKey(1)},
                               **{k: v[:1] for k, v in batch.items()})
        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P('data'))
        fn = jax.jit(pipeline,
                     in_shardings=(repl, repl, data),
                     out_shardings=repl)
        dev_batch = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, data), batch)
        dev_params = jax.device_put(variables['params'], repl)
        dev_voc = jax.device_put(voc_params, repl)
        float(fn(dev_params, dev_voc, dev_batch))        # compile
        runs = args.runs
        t0 = time.perf_counter()
        for i in range(runs):
            float(fn(dev_params, dev_voc, dev_batch))
        elapsed = time.perf_counter() - t0
        nb_wav = (T - 1) * hp.hop_length + hp.filter_length
        audio_s = runs * B * nb_wav / hp.sampling_rate
        rate = audio_s / elapsed
        if base_rate is None:
            base_rate = rate / n
        eff = rate / (base_rate * n)
        results.append({'devices': n, 'batch': B,
                        'audio_s_per_s': round(rate, 2),
                        'scaling_efficiency': round(eff, 3)})
        print(json.dumps(results[-1]))
    return results


if __name__ == '__main__':
    parser = argparse.ArgumentParser()
    parser.add_argument('--mesh_sizes', type=int, nargs='*',
                        default=[1, 2, 4, 8])
    parser.add_argument('--per_device_batch', type=int, default=8)
    parser.add_argument('--frames', type=int, default=256)
    parser.add_argument('--vocoder_chunk', type=int, default=8)
    parser.add_argument('--runs', type=int, default=3)
    parser.add_argument('--virtual_cpu', type=int, default=0,
                        help='simulate N CPU devices (sharding validation)')
    args = parser.parse_args()
    main(args)

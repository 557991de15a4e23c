"""Multi-host training rehearsal: 2 real OS processes over jax.distributed.

Validates the BASELINE multi-host configuration end-to-end without a pod
slice: two processes rendezvous through ``jax.distributed.initialize`` on
localhost (replacing the reference's TCP/NCCL rendezvous,
reference: src/daft_exprt/train.py:224-227), each exposing 4 virtual CPU
devices, forming one global 8-device data-parallel mesh. Each host feeds
its local half of the global batch (DistributedSampler semantics), the
jitted train step reduces gradients through XLA collectives, and both
hosts must report bit-identical global losses.

Usage: python scripts/rehearse_multihost.py            # parent: spawns 2 workers
       python scripts/rehearse_multihost.py --worker I # internal
       python scripts/rehearse_multihost.py --scaling  # timed 1-host vs
           2-host runs on the same virtual mesh; writes
           MULTIHOST_SCALING_r*.json with per-host throughput + efficiency
           (the BASELINE >=85% audio-s/s scaling target is HARDWARE-GATED:
           no pod slice is reachable here, so the artifact audits the
           machinery and the accounting on virtual CPU devices, not ICI)
"""
import argparse
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_PROC = int(os.environ.get('REHEARSE_N_PROC', '2'))
DEV_PER_PROC = 2
PORT = int(os.environ.get('REHEARSE_PORT', '0')) or None
STEPS = 2
TIMED_STEPS = int(os.environ.get('REHEARSE_TIMED_STEPS', '0'))


def _free_port():
    import socket
    with socket.socket() as s:
        s.bind(('localhost', 0))
        return s.getsockname()[1]


def worker(pid):
    # Pin this worker to its assigned cores BEFORE importing jax: every
    # XLA/Eigen thread the process spawns inherits the affinity mask, so
    # each host leg gets identical, disjoint CPU resources. Without this
    # the 1-host leg's single process contends with itself across all
    # cores differently than the 2-host leg's processes do, which produced
    # a nonsensical super-linear "efficiency 2.06" scaling artifact.
    cpuset = os.environ.get('REHEARSE_CPUSET', '')
    if cpuset:
        os.sched_setaffinity(0, {int(c) for c in cpuset.split(',')})
    if os.environ.get('REHEARSE_HANG_DEBUG'):
        import faulthandler
        faulthandler.dump_traceback_later(
            int(os.environ['REHEARSE_HANG_DEBUG']), exit=True)
    import jax
    # CPU multi-process collectives need the gloo implementation
    jax.config.update('jax_cpu_collectives_implementation', 'gloo')
    jax.distributed.initialize(coordinator_address=f'localhost:{PORT}',
                               num_processes=N_PROC, process_id=pid)
    import numpy as np
    from __graft_entry__ import _make_batch
    from daft_exprt_tpu.hparams import HyperParams
    from daft_exprt_tpu.loss import loss_cfg_from_hparams
    from daft_exprt_tpu.models.daft_exprt import DaftExprt
    from daft_exprt_tpu.parallel.mesh import make_mesh, shard_batch
    from daft_exprt_tpu.parallel.train_step import (
        make_optimizer, make_train_step)

    # NOTE: jax.process_count() reports the default backend, which the
    # axon TPU plugin claims even under JAX_PLATFORMS=cpu — count the
    # distributed CPU client's processes from its devices instead
    cpus = jax.devices('cpu')
    n_global = len(cpus)
    n_proc = len({d.process_index for d in cpus})
    assert (n_global, n_proc) == (N_PROC * DEV_PER_PROC, N_PROC), \
        (n_global, n_proc)
    # pin init/PRNG to the local CPU — otherwise they run on whatever
    # default backend is registered (the axon TPU plugin on this image,
    # reached through a tunnel both workers would contend on)
    local_cpus = [d for d in cpus if d.process_index == pid]
    jax.config.update('jax_default_device', local_cpus[0])

    small = {'nb_blocks': 2, 'hidden_embed_dim': 32, 'attn_nb_heads': 2,
             'attn_dropout': 0.1, 'conv_kernel': 3, 'conv_channels': 64,
             'conv_dropout': 0.1}
    hp = HyperParams(
        verbose=False, training_files='unused', validation_files='unused',
        output_directory='/tmp/rehearse', language='english',
        speakers=['lj'], phoneme_encoder=dict(small),
        accent_encoder=dict(small), frame_decoder=dict(small),
        batch_size=n_global, accumulation_steps=1)
    model = DaftExprt.from_hparams(hp)
    mesh = make_mesh(n_data=n_global, n_model=1, devices=cpus)

    B_global, L, T = n_global, 16, 64
    B_local = B_global // N_PROC
    # deterministic global batch; each host slices out its own half
    global_batch = _make_batch(hp, B_global, L, T, seed=0)
    local = {k: v[pid * B_local:(pid + 1) * B_local]
             for k, v in global_batch.items()}
    raw_local = {'frames_energy': local['frames_energy'],
                 'frames_pitch': local['frames_pitch']}

    variables = model.init({'params': jax.random.PRNGKey(0),
                            'dropout': jax.random.PRNGKey(1)},
                           **{k: v[:1] for k, v in global_batch.items()})
    params = variables['params']
    tx = make_optimizer(hp)
    opt_state = tx.init(params)
    step = make_train_step(model, tx, loss_cfg_from_hparams(hp), None,
                           mesh=mesh, accumulation_steps=1, donate=False)

    dev_batch = shard_batch(local, mesh)
    dev_raw = shard_batch(raw_local, mesh)
    for it in range(STEPS):
        params, opt_state, metrics = step(
            params, opt_state, dev_batch, dev_raw, np.float32(it),
            jax.random.PRNGKey(it))
        loss = float(metrics['loss'])
        print(f'WORKER {pid} step {it} loss {loss:.10f}', flush=True)
    if TIMED_STEPS:
        # timed leg for the scaling artifact: the warmup steps above paid
        # the compile; fetch the loss each step so the host clock spans
        # real execution (CPU backend is synchronous, but keep the fetch
        # for protocol parity with the TPU timing rule)
        import time
        t0 = time.perf_counter()
        for it in range(STEPS, STEPS + TIMED_STEPS):
            params, opt_state, metrics = step(
                params, opt_state, dev_batch, dev_raw, np.float32(it),
                jax.random.PRNGKey(it))
            float(metrics['loss'])
        dt = time.perf_counter() - t0
        print(f'WORKER {pid} timed {TIMED_STEPS} steps {dt:.4f}s '
              f'local_batch {B_local}', flush=True)
    jax.distributed.shutdown()


def parent(n_proc=None, timed_steps=0, pin_cpus=False):
    n_proc = n_proc or N_PROC
    env = dict(os.environ)
    env['JAX_PLATFORMS'] = 'cpu'
    env['REHEARSE_PORT'] = str(PORT or _free_port())
    env['REHEARSE_N_PROC'] = str(n_proc)
    env['REHEARSE_TIMED_STEPS'] = str(timed_steps)
    env['XLA_FLAGS'] = (f'--xla_force_host_platform_device_count'
                        f'={DEV_PER_PROC}')
    # per-worker CPU sets sized for the LARGEST leg (2 hosts), so the
    # 1-host and 2-host timed legs see identical per-host resources —
    # >100% "efficiency" is then impossible by construction
    cores_per = max(1, len(os.sched_getaffinity(0)) // 2) if pin_cpus else 0

    def _env_for(i):
        if not pin_cpus:
            return env
        avail = sorted(os.sched_getaffinity(0))
        cpuset = [avail[(i * cores_per + j) % len(avail)]
                  for j in range(cores_per)]
        return dict(env, REHEARSE_CPUSET=','.join(map(str, cpuset)))

    procs = [subprocess.Popen(
        [sys.executable, '-u', os.path.abspath(__file__), '--worker', str(i)],
        env=_env_for(i), stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for i in range(n_proc)]
    try:
        outs = [p.communicate(timeout=540)[0] for p in procs]
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    codes = [p.returncode for p in procs]
    losses = {}
    timings = {}
    for i, out in enumerate(outs):
        for m in re.finditer(r'WORKER (\d+) step (\d+) loss ([\d.eE+-]+)',
                             out):
            losses[(int(m.group(2)), int(m.group(1)))] = m.group(3)
        for m in re.finditer(
                r'WORKER (\d+) timed (\d+) steps ([\d.]+)s local_batch (\d+)',
                out):
            timings[int(m.group(1))] = {
                'steps': int(m.group(2)), 'seconds': float(m.group(3)),
                'local_batch': int(m.group(4))}
        if codes[i] != 0:
            print(f'--- worker {i} output ---\n{out}')
    assert codes == [0] * n_proc, f'worker exit codes {codes}'
    for step_i in range(STEPS):
        vals = {losses.get((step_i, p)) for p in range(n_proc)}
        assert len(vals) == 1 and None not in vals, \
            f'step {step_i}: hosts disagree: {vals}'
    print(f'multi-host rehearsal OK: {n_proc} processes x {DEV_PER_PROC} '
          f'devices, {STEPS} steps, losses identical across hosts: '
          f'{[losses[(s, 0)] for s in range(STEPS)]}')
    return timings


def scaling(out_path, timed_steps=20):
    """Weak-scaling accounting on the virtual mesh: per-device batch fixed,
    1-host (2 devices) vs 2-host (4 devices) timed train steps. Writes the
    per-host throughput table + efficiency to ``out_path``.

    IMPORTANT caveat (recorded in the artifact): no multi-chip TPU is
    reachable from this environment, so this measures the full multi-host
    software path (distributed init, global mesh, XLA collectives, per-host
    sharded feed) on virtual CPU devices — it audits machinery and
    accounting, NOT ICI bandwidth. The BASELINE >=85% scaling row needs a
    real pod slice."""
    results = {}
    for n in (1, 2):
        timings = parent(n_proc=n, timed_steps=timed_steps, pin_cpus=True)
        assert len(timings) == n, f'{n}-host run produced {timings}'
        per_host = {
            str(pid): dict(t, samples_per_s=t['steps'] * t['local_batch']
                           / t['seconds'])
            for pid, t in timings.items()}
        # global throughput: all hosts run the SAME global steps
        # concurrently, so global samples/s = steps * global_batch /
        # max(host wall time)
        gbatch = sum(t['local_batch'] for t in timings.values())
        wall = max(t['seconds'] for t in timings.values())
        results[f'{n}_host'] = {
            'hosts': n, 'devices': n * DEV_PER_PROC,
            'global_batch': gbatch,
            'per_host': per_host,
            'global_samples_per_s': timed_steps * gbatch / wall,
        }
    t1 = results['1_host']['global_samples_per_s']
    t2 = results['2_host']['global_samples_per_s']
    eff = t2 / (2.0 * t1)
    results['scaling_efficiency_1_to_2_hosts'] = eff
    results['cpu_pinning'] = (
        f'each worker pinned to {max(1, len(os.sched_getaffinity(0)) // 2)}'
        ' dedicated core(s) in BOTH legs (sched_setaffinity before jax '
        'import), so per-host resources are identical across legs')
    results['caveat'] = (
        'virtual CPU mesh (no pod slice reachable): audits the multi-host '
        'machinery and throughput accounting, not ICI. The BASELINE >=85% '
        'audio-s/s scaling target is hardware-gated.')
    # resource-comparable legs make super-linear scaling impossible; an
    # efficiency outside this band means the accounting itself is broken
    # (the r4 artifact's 2.06 came from unpinned thread-pool contention)
    assert 0.0 < eff <= 1.05, f'implausible scaling efficiency {eff:.3f}'
    with open(out_path, 'w') as f:
        json.dump(results, f, indent=2, sort_keys=True)
    print(f'scaling artifact -> {out_path}: eff(1->2 hosts) = '
          f'{results["scaling_efficiency_1_to_2_hosts"]:.3f} '
          f'(virtual CPU mesh)')
    return results


if __name__ == '__main__':
    ap = argparse.ArgumentParser()
    ap.add_argument('--worker', type=int, default=None)
    ap.add_argument('--scaling', action='store_true')
    ap.add_argument('--out', type=str,
                    default=os.path.join(REPO, 'MULTIHOST_SCALING_r05.json'))
    ap.add_argument('--timed_steps', type=int, default=20)
    args = ap.parse_args()
    if args.worker is not None:
        worker(args.worker)
    elif args.scaling:
        scaling(args.out, args.timed_steps)
    else:
        parent()

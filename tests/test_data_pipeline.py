"""Data-pipeline robustness: corrupt-sample retry, host sharding,
set creation + stats round trip."""
import os

import numpy as np
import pytest

from daft_exprt_tpu.data import DaftExprtDataset, BatchIterator
from daft_exprt_tpu.data.sets import (
    create_sets, extract_features_stats, save_stats,
)

from tests.synth_data import build_synthetic_dataset
from tests.test_training import make_hp


@pytest.fixture(scope='module')
def synth(tmp_path_factory):
    root = str(tmp_path_factory.mktemp('dp'))
    train_list, val_list, features_root = build_synthetic_dataset(
        root, files_per_speaker=8)
    return root, train_list, val_list, features_root


def test_corrupt_sample_retry(synth):
    root, train_list, val_list, _ = synth
    hp = make_hp(root, train_list, val_list)
    ds = DaftExprtDataset(train_list, hp, shuffle=False)
    # corrupt the first entry's mel file
    fdir, fname, _ = ds.data[0]
    mel_path = os.path.join(fdir, f'{fname}.npy')
    backup = open(mel_path, 'rb').read()
    try:
        with open(mel_path, 'wb') as f:
            f.write(b'corrupt')
        item = ds[0]                      # falls through to a neighbor
        assert item['feature_file'] != fname
    finally:
        with open(mel_path, 'wb') as f:
            f.write(backup)


def test_host_sharding_partitions(synth):
    root, train_list, val_list, _ = synth
    hp = make_hp(root, train_list, val_list)
    ds = DaftExprtDataset(train_list, hp, shuffle=False)
    shards = {0: set(), 1: set()}
    for host in range(2):
        it = BatchIterator(ds, hp, batch_size=1, shuffle=True,
                           drop_last=False, host_id=host, num_hosts=2)
        it.set_epoch(3)
        for _, dirs, files in it:
            shards[host].update(zip(dirs, files))
    assert shards[0].isdisjoint(shards[1])
    assert len(shards[0]) + len(shards[1]) == len(ds)


def test_create_sets_and_stats(synth, tmp_path):
    root, _, _, features_root = synth
    hp = make_hp(root,
                 str(tmp_path / 'train.txt'), str(tmp_path / 'val.txt'))
    create_sets(features_root, hp, proportion_validation=25)
    with open(hp.training_files) as f:
        train_lines = [l for l in f if l.strip()]
    with open(hp.validation_files) as f:
        val_lines = [l for l in f if l.strip()]
    assert len(train_lines) > 0 and len(val_lines) > 0
    # every 100/25=4th file goes to validation
    assert len(val_lines) == 2 * (8 // 4)
    stats = extract_features_stats(hp)
    assert 'spk 0' in stats and 'spk 1' in stats and 'symbols' in stats
    for spk in ('spk 0', 'spk 1'):
        assert stats[spk]['pitch']['std'] > 0
    path = save_stats(stats, str(tmp_path / 'exp'))
    assert os.path.isfile(path)


def test_prefetch_iterator_matches_inner():
    """PrefetchIterator yields identical batches in order across epochs
    and propagates worker exceptions."""
    from daft_exprt_tpu.data.dataset import PrefetchIterator

    class Fake:
        def __init__(self):
            self.epoch = 0

        def set_epoch(self, e):
            self.epoch = e

        def __len__(self):
            return 4

        def __iter__(self):
            base = self.epoch * 10
            for i in range(4):
                yield base + i

    inner = Fake()
    pf = PrefetchIterator(inner, depth=2)
    assert len(pf) == 4
    assert list(pf) == [0, 1, 2, 3]
    pf.set_epoch(2)
    assert list(pf) == [20, 21, 22, 23]

    class Boom:
        def __iter__(self):
            yield 1
            raise RuntimeError('bad sample')

    import pytest as _pytest
    it = iter(PrefetchIterator(Boom()))
    assert next(it) == 1
    with _pytest.raises(RuntimeError, match='bad sample'):
        next(it)


def test_prefetch_iterator_early_break_no_thread_leak():
    """Abandoning iteration mid-epoch (train.py's final-iteration break)
    must stop the worker thread, not leave it blocked on a full queue."""
    import gc
    import threading
    import time
    from daft_exprt_tpu.data.dataset import PrefetchIterator

    class Many:
        def __iter__(self):
            for i in range(1000):
                yield np.zeros(1000) + i

    before = threading.active_count()
    for _ in range(5):
        for x in PrefetchIterator(Many(), depth=2):
            break                      # abandon mid-epoch
    gc.collect()                       # finalize abandoned generators
    deadline = time.time() + 5.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before

"""GrainLoader: grain execution engine, Loader-identical stream."""

import os

import numpy as np
import pytest

from gaviko_tpu.data.grain_pipeline import GrainLoader
from gaviko_tpu.data.pipeline import (
    Loader,
    dataset_from_dataframe,
    pick_loader,
    split_dataframe,
)


def _rng_transform(x, rng=None):
    # Module-level (picklable for grain process workers); rng-dependent so
    # the per-sample RNG keying is actually exercised.
    if rng is not None:
        return x + rng.rand(*x.shape).astype(np.float32)
    return x


def _make_ds(tmp_path, n=7, train=True):
    import pandas as pd

    volumes = os.path.join(str(tmp_path), "volumes")
    os.makedirs(volumes, exist_ok=True)
    rng = np.random.RandomState(0)
    rows = []
    for i in range(n):
        name = f"v{i}.npz"
        np.savez(os.path.join(volumes, name),
                 data=rng.rand(6, 8, 8).astype(np.float32))
        rows.append({"mri_path": name, "kl_grade": i % 5, "subset": "train"})
    df = split_dataframe(pd.DataFrame(rows), "train")
    return dataset_from_dataframe(df, _rng_transform, train, volumes)


def _drain(loader, epochs=2):
    out = []
    for _ in range(epochs):
        for inputs, labels, n_valid in loader:
            out.append((inputs.copy(),
                        None if labels is None else labels.copy(), n_valid))
    return out


@pytest.mark.parametrize("shard", [(0, 1), (1, 2)])
def test_grain_stream_identical_to_loader(tmp_path, shard):
    """Same shuffle permutations, per-sample RNG, padding, labels and
    n_valid across epochs — the grain loader is an engine swap, not a new
    semantics. Covers the sharded (multi-host slice) path too."""
    kw = dict(batch_size=4, shuffle=True, num_workers=2, seed=5,
              pad_to_batch=True, shard=shard)
    ref = _drain(Loader(_make_ds(tmp_path), **kw))
    got = _drain(GrainLoader(_make_ds(tmp_path), **kw))
    assert len(ref) == len(got)
    for (ri, rl, rn), (gi, gl, gn) in zip(ref, got):
        np.testing.assert_array_equal(ri, gi)
        np.testing.assert_array_equal(rl, gl)
        assert rn == gn


def test_grain_unpadded_final_batch(tmp_path):
    kw = dict(batch_size=4, shuffle=False, num_workers=2)
    ref = _drain(Loader(_make_ds(tmp_path, train=False), **kw), epochs=1)
    got = _drain(GrainLoader(_make_ds(tmp_path, train=False), **kw), epochs=1)
    assert [r[2] for r in ref] == [g[2] for g in got] == [4, 3]
    for (ri, _, _), (gi, _, _) in zip(ref, got):
        np.testing.assert_array_equal(ri, gi)


def test_grain_propagates_load_errors(tmp_path):
    ds = _make_ds(tmp_path, n=3, train=False)
    os.remove(ds.paths[1])
    with pytest.raises(Exception):
        _drain(GrainLoader(ds, batch_size=2, num_workers=2), epochs=1)


def test_pick_loader_dispatch():
    assert pick_loader({"data": {}}) is Loader
    cls = pick_loader({"data": {"loader": "grain", "grain_processes": 0}})
    assert cls.func is GrainLoader  # functools.partial
    with pytest.raises(ValueError, match="data.loader"):
        pick_loader({"data": {"loader": "torch"}})


def test_grain_process_workers(tmp_path):
    """mp_prefetch path: module-level transform (picklable), same stream."""
    kw = dict(batch_size=4, shuffle=True, num_workers=2, seed=5,
              pad_to_batch=True)
    ref = _drain(Loader(_make_ds(tmp_path), **kw), epochs=1)
    got = _drain(GrainLoader(_make_ds(tmp_path), processes=2, **kw), epochs=1)
    for (ri, rl, rn), (gi, gl, gn) in zip(ref, got):
        np.testing.assert_array_equal(ri, gi)
        np.testing.assert_array_equal(rl, gl)
        assert rn == gn


def test_train_cli_with_grain_loader(tmp_path):
    """data.loader: grain drives the real training entry point."""
    import train as train_mod

    from tests.test_end_to_end import make_synth_dataset, tiny_config

    root = str(tmp_path)
    csv_path, volumes = make_synth_dataset(root, n_train=4, n_val=2)
    config = tiny_config(root, csv_path, volumes, method="bitfit", epochs=1)
    config["data"]["loader"] = "grain"
    result = train_mod.train(config)
    import pandas as pd

    log = pd.read_csv(result["csv_log"])
    assert len(log) == 2 + 1 and np.isfinite(log["train_step_loss"]).all()

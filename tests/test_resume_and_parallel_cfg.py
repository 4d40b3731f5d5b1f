"""Mid-training resume + config-driven parallel training."""

import os

import numpy as np
import pandas as pd
import pytest

from tests.test_end_to_end import make_synth_dataset, tiny_config


def test_resume_roundtrip(tmp_path):
    import train as train_mod

    root = str(tmp_path)
    csv_path, volumes = make_synth_dataset(root)
    config = tiny_config(root, csv_path, volumes, method="bitfit", epochs=2)

    r1 = train_mod.train(config)
    state_path = os.path.join(
        root, "weights", "experiments", "bitfit", "resume_state.npz"
    )
    assert os.path.exists(state_path)

    # Continue to epoch 4 from the saved state.
    config2 = tiny_config(root, csv_path, volumes, method="bitfit", epochs=4)
    config2["train"]["resume"] = "auto"
    r2 = train_mod.train(config2)
    assert r2["best_val_acc"] >= r1["best_val_acc"]
    # Resumed run should only run epochs 2..3.
    log = pd.read_csv(r2["csv_log"])
    assert log["epoch"].min() == 2


def test_parallel_training_via_config(tmp_path):
    import train as train_mod

    root = str(tmp_path)
    csv_path, volumes = make_synth_dataset(root, n_train=8, n_val=4)
    config = tiny_config(root, csv_path, volumes, method="bitfit", epochs=1)
    config["data"]["batch_size"] = 4
    config["train"]["parallel"] = {"enabled": True, "data": 4, "model": 2,
                                   "zero": True}
    result = train_mod.train(config)
    assert result["best_ckpt_path"] is None or os.path.exists(result["best_ckpt_path"])
    log = pd.read_csv(result["csv_log"])
    assert len(log) > 0
    assert np.isfinite(log["train_step_loss"]).all()


def test_orbax_checkpoint_backend(tmp_path):
    import train as train_mod

    root = str(tmp_path)
    csv_path, volumes = make_synth_dataset(root)
    config = tiny_config(root, csv_path, volumes, method="bitfit", epochs=2)
    config["train"]["checkpoint_backend"] = "orbax"
    train_mod.train(config)
    state_dir = os.path.join(root, "weights", "experiments", "bitfit", "resume_state")
    assert os.path.isdir(state_dir)

    config2 = tiny_config(root, csv_path, volumes, method="bitfit", epochs=3)
    config2["train"]["checkpoint_backend"] = "orbax"
    config2["train"]["resume"] = "auto"
    r2 = train_mod.train(config2)
    log = pd.read_csv(r2["csv_log"])
    assert log["epoch"].min() == 2


def test_training_is_seed_deterministic(tmp_path):
    """Same config + seed -> bitwise-identical trained parameters."""
    import train as train_mod

    root = str(tmp_path)
    csv_path, volumes = make_synth_dataset(root)

    states = []
    for run in ("a", "b"):
        config = tiny_config(root, csv_path, volumes, method="bitfit", epochs=2)
        config["train"]["save_dir"] = os.path.join(root, f"w_{run}")
        config["utils"]["log_dir"] = os.path.join(root, f"log_{run}")
        config["train"]["seed"] = 7
        train_mod.train(config)
        path = os.path.join(root, f"w_{run}", "experiments", "bitfit",
                            "resume_state.npz")
        with np.load(path) as z:
            states.append({k: z[k].copy() for k in z.files if k.startswith("param::")})
    assert set(states[0]) == set(states[1])
    for k in states[0]:
        np.testing.assert_array_equal(states[0][k], states[1][k], err_msg=k)


def test_shipped_tpu_yaml_drives_mesh_path(tmp_path):
    """The committed gaviko_tpu.yaml turns on parallel/bf16/device_augment/
    orbax; with only geometry shrunk it must run the mesh training path
    end-to-end on the virtual 8-device mesh (VERDICT r1 item 8)."""
    import train as train_mod
    from gaviko_tpu.config import apply_method_override, load_config

    yaml_path = os.path.join(
        os.path.dirname(__file__), "..", "gaviko_tpu", "configs",
        "gaviko_tpu.yaml",
    )
    config = load_config(yaml_path)
    assert config["train"]["parallel"]["enabled"]
    assert config["train"]["parallel"]["data"] == "auto"
    assert config["train"]["precision"] == "bf16"
    assert config["train"]["device_augment"]
    assert config["train"]["checkpoint_backend"] == "orbax"
    apply_method_override(config, "gaviko")

    root = str(tmp_path)
    csv_path, volumes = make_synth_dataset(root, n_train=8, n_val=8)
    # Shrink geometry only — every feature flag stays as shipped.
    config["utils"]["log_dir"] = os.path.join(root, "log")
    config["utils"]["results_dir"] = os.path.join(root, "outputs")
    config["data"].update(data_path=csv_path, image_folder=volumes,
                          batch_size=8, num_workers=2)
    config["model"].update(image_size=32, frames=24, backbone="vit-t16",
                           num_prompts=4, prompt_latent_dim=8, local_dim=8,
                           local_k=[2, 2, 2], DHW=[2, 2, 2])
    config["train"].update(num_epochs=1, save_dir=os.path.join(root, "weights"),
                           memory_verbose=False, flops_calculation=False)

    result = train_mod.train(config)
    log = pd.read_csv(result["csv_log"])
    assert len(log) > 0 and np.isfinite(log["train_step_loss"]).all()
    # orbax resume state written
    assert os.path.isdir(os.path.join(root, "weights", "experiments",
                                      "gaviko", "resume_state"))


def test_loader_epoch_pinning_and_skip(tmp_path):
    """Loader.set_epoch pins the shuffle to the TRUE epoch number and
    skip_batches drops exactly the consumed prefix (one epoch only)."""
    from gaviko_tpu.data.pipeline import Loader, VolumeDataset

    ds = VolumeDataset(paths=[f"v{i}" for i in range(10)], labels=None,
                       transform=lambda x: x)
    a = Loader(ds, batch_size=3, shuffle=True, seed=5)
    b = Loader(ds, batch_size=3, shuffle=True, seed=5)
    a.set_epoch(3)
    b.set_epoch(3)
    order_a = [list(x) for x in a._batches()]
    assert order_a == [list(x) for x in b._batches()]
    # A fresh process resuming at epoch 3 sees the same order as a run that
    # arrived there by iterating (set_epoch is what makes that true).
    b.set_epoch(0)
    assert order_a != [list(x) for x in b._batches()] or len(ds) <= 3

    a.set_epoch(3)
    a.skip_batches(2)
    assert [list(x) for x in a._batches()] == order_a[2:]
    a.set_epoch(3)  # skip is consumed: next epoch is full again
    assert [list(x) for x in a._batches()] == order_a


def test_preemption_guard_signal_roundtrip():
    """SIGTERM latches the flag; previous handlers are restored on exit."""
    import signal

    from gaviko_tpu.train.preemption import PreemptionGuard

    before_term = signal.getsignal(signal.SIGTERM)
    with PreemptionGuard() as guard:
        assert not guard.preempted
        os.kill(os.getpid(), signal.SIGTERM)
        # os.kill to self from the main thread: delivered synchronously at
        # the next interpreter check, certainly by this assert.
        assert guard.preempted
    assert signal.getsignal(signal.SIGTERM) is before_term


class _PreemptingLoader:
    """Wraps a Loader; sends this process SIGTERM just before yielding the
    ``after``-th batch (0-based) of the first epoch, mimicking a TPU-VM
    preemption notice arriving while a step is in flight."""

    def __init__(self, inner, after):
        self.inner = inner
        self.after = after
        self.fired = False

    def __len__(self):
        return len(self.inner)

    def set_epoch(self, e):
        self.inner.set_epoch(e)

    def skip_batches(self, k):
        self.inner.skip_batches(k)

    def __iter__(self):
        import signal

        for i, item in enumerate(self.inner):
            if not self.fired and i == self.after:
                self.fired = True
                os.kill(os.getpid(), signal.SIGTERM)
            yield item


def test_preemption_mid_epoch_resume_is_bitwise_exact(tmp_path):
    """SIGTERM mid-epoch -> state saved at the step boundary -> `--resume
    auto` continues from the exact next batch. The preempted+resumed run
    must produce BITWISE-identical final parameters to an uninterrupted
    run: set_epoch pins the shuffle, per-sample RNG is global-index-keyed,
    dropout RNG is global-step-keyed, and the optimizer state round-trips
    exactly."""
    import json

    import jax

    import train as train_mod
    from gaviko_tpu.models.factory import build_model
    from gaviko_tpu.models.pretrained import build_params
    from gaviko_tpu.train.loop import run_training

    root = str(tmp_path)
    csv_path, volumes = make_synth_dataset(root, n_train=8, n_val=2)

    def fresh(save_dir, epochs=2, h2d_prefetch=False):
        config = tiny_config(root, csv_path, volumes, method="bitfit",
                             epochs=epochs)
        config["train"]["save_dir"] = os.path.join(root, save_dir)
        # _PreemptingLoader's "signal just before batch `after`" semantics
        # assume the MAIN loop consumes the loader; with the H2D prefetch
        # thread the worker races ahead, so the signal lands at a
        # nondeterministic step. Prefetch off here pins the step count;
        # test_preemption_under_h2d_prefetch_resumes_exactly covers the
        # prefetch-on contract (exactness without a pinned count).
        config["train"]["h2d_prefetch"] = h2d_prefetch
        config["utils"]["log_dir"] = os.path.join(root, save_dir, "log")
        model = build_model(config["model"])
        params = build_params(model, jax.random.PRNGKey(0),
                              pretrained_dir=os.path.join(root, "nowhere"))
        loaders = train_mod.make_loaders(config)
        return config, model, params, loaders

    def final_params(save_dir):
        path = os.path.join(root, save_dir, "experiments", "bitfit",
                            "resume_state.npz")
        with np.load(path) as z:
            meta = json.loads(bytes(z["meta::json"]).decode())
            return {k: z[k].copy() for k in z.files
                    if k.startswith("param::")}, meta

    # Run A: uninterrupted.
    cfg, model, params, loaders = fresh("wA")
    ra = run_training(cfg, model, params, loaders, "ts")
    assert not ra["preempted"]

    # Run B: preempted during batch 2 of epoch 0 (of 4 batches) ...
    cfg, model, params, (tr, va, tl, vl) = fresh("wB")
    rb = run_training(cfg, model, params,
                      (_PreemptingLoader(tr, after=2), va, tl, vl), "ts")
    assert rb["preempted"]
    _, meta = final_params("wB")
    assert meta["epoch"] == 0 and meta["step_in_epoch"] == 3
    assert meta["global_step"] == 3

    # ... then resumed: skips the 3 consumed batches and finishes.
    cfg, model, params, loaders = fresh("wB")
    cfg["train"]["resume"] = "auto"
    rb2 = run_training(cfg, model, params, loaders, "ts")
    assert not rb2["preempted"]
    log = pd.read_csv(rb2["csv_log"])
    assert log["train_step"].min() == 4  # steps 1-3 ran pre-preemption

    pa, meta_a = final_params("wA")
    pb, meta_b = final_params("wB")
    assert meta_a["global_step"] == meta_b["global_step"]
    assert set(pa) == set(pb)
    for k in pa:
        np.testing.assert_array_equal(pa[k], pb[k], err_msg=k)

    # ---- same contract with the H2D prefetch thread ON ----
    # The signal now lands at a thread-race-dependent step, so no pinned
    # step count — the contract is: whatever boundary was saved, `--resume
    # auto` continues to BITWISE-identical final parameters.
    cfg, model, params, (tr, va, tl, vl) = fresh("wC", h2d_prefetch=True)
    rc = run_training(cfg, model, params,
                      (_PreemptingLoader(tr, after=2), va, tl, vl), "ts")
    assert rc["preempted"]
    cfg, model, params, loaders = fresh("wC", h2d_prefetch=True)
    cfg["train"]["resume"] = "auto"
    rc2 = run_training(cfg, model, params, loaders, "ts")
    assert not rc2["preempted"]
    pc, meta_c = final_params("wC")
    assert meta_a["global_step"] == meta_c["global_step"]
    for k in pa:
        np.testing.assert_array_equal(pa[k], pc[k], err_msg=k)


def test_gaviko_dhw_derived_and_validated():
    """GAViKO's DHW defaults to the real patch grid, not the reference's
    hard-coded (10,10,10) ctor default (ref gaviko.py:348 — crashes at any
    other geometry); an explicit DHW that disagrees with the grid raises a
    named error instead of a broadcast failure deep in the mask math."""
    from gaviko_tpu.config import make_spec

    base = dict(image_size=32, image_patch_size=16, frames=24,
                frame_patch_size=12, num_classes=5, channels=1, pool="cls",
                backbone="vit-t16", method="gaviko")
    assert make_spec(dict(base)).DHW == (2, 2, 2)
    # Full geometry derives the reference default exactly.
    full = dict(base, image_size=160, frames=120)
    assert make_spec(full).DHW == (10, 10, 10)
    # Reordering the grid is allowed (same token count)...
    assert make_spec(dict(base, frames=48)).DHW == (4, 2, 2)
    assert make_spec(dict(base, frames=48, DHW=[2, 4, 2])).DHW == (2, 4, 2)
    # ...but a wrong token count is a clean ValueError.
    with pytest.raises(ValueError, match="DHW"):
        make_spec(dict(base, DHW=[10, 10, 10]))


def test_early_stop_saves_current_epoch_resume_state(tmp_path):
    """Early stopping must persist THIS epoch's boundary state before
    breaking (regression: the break used to skip the end-of-loop
    _save_resume, leaving resume_state one epoch stale so a rerun with a
    higher patience replayed an already-completed epoch)."""
    import json

    import train as train_mod

    root = str(tmp_path)
    csv_path, volumes = make_synth_dataset(root)
    config = tiny_config(root, csv_path, volumes, method="bitfit", epochs=10)
    config["train"]["patience"] = 1

    r = train_mod.train(config)
    log = pd.read_csv(r["csv_log"])
    epochs_completed = int(log["epoch"].max()) + 1
    assert epochs_completed < 10, "early stopping never fired"

    state_path = os.path.join(
        root, "weights", "experiments", "bitfit", "resume_state.npz"
    )
    with np.load(state_path) as z:
        meta = json.loads(bytes(z["meta::json"]).decode())
    assert meta["epoch"] == epochs_completed
    assert meta["step_in_epoch"] == 0


def test_resume_save_interval_rate_limits_boundary_saves(tmp_path, monkeypatch):
    """Boundary resume saves are wall-time rate-limited
    (train.resume_save_interval_s, default 600): fast epochs skip the full
    device->host state gather (through the axon relay it dominated epoch
    wall time), while the FINAL epoch always saves so `--resume auto` with
    a higher num_epochs continues correctly. interval 0 = every epoch."""
    import gaviko_tpu.utils.checkpoint as ckpt_mod
    import train as train_mod

    calls = []
    real = ckpt_mod.save_train_state

    def counting(path, *a, **kw):
        calls.append(path)
        return real(path, *a, **kw)

    monkeypatch.setattr(ckpt_mod, "save_train_state", counting)

    root = str(tmp_path)
    csv_path, volumes = make_synth_dataset(root)

    # Default interval (600 s >> test wall time): the FIRST boundary always
    # saves (crash durability stays one-epoch from the start — advisor r4),
    # intermediate boundaries are rate-limited away, and the final epoch
    # always saves -> 2 of 3 boundaries.
    config = tiny_config(root, csv_path, volumes, method="bitfit", epochs=3)
    config["train"]["patience"] = 100  # keep early stopping out of the way
    train_mod.train(config)
    assert len(calls) == 2, calls
    state_path = os.path.join(
        root, "weights", "experiments", "bitfit", "resume_state.npz")
    assert os.path.exists(state_path)

    # interval 0: every epoch boundary saves (the old behavior, opt-in).
    calls.clear()
    config = tiny_config(root, csv_path, volumes, method="bitfit", epochs=3)
    config["train"]["patience"] = 100
    config["train"]["resume_save_interval_s"] = 0
    train_mod.train(config)
    assert len(calls) == 3, calls


def test_preemption_at_epoch_boundary_saves_despite_interval(tmp_path):
    """A SIGTERM that lands during validation/bookkeeping (epoch boundary)
    must persist resume state even when resume_save_interval_s has not
    elapsed — 'preemption always saves' is the resume contract (regression:
    the rate-limit gate skipped the save and the break exited with stale
    or no state)."""
    import json
    import logging as _logging
    import signal

    import train as train_mod

    root = str(tmp_path)
    csv_path, volumes = make_synth_dataset(root)
    config = tiny_config(root, csv_path, volumes, method="bitfit", epochs=5)
    config["train"]["patience"] = 100
    config["train"]["resume_save_interval_s"] = 1e9  # never by-time

    # Filters only see records that pass the root LEVEL check; train()
    # assumes the CLI configured logging, so configure INFO here.
    from gaviko_tpu.utils.logging import setup_logging

    setup_logging(log_dir=os.path.join(root, "log"))

    class FireOnEpochSummary(_logging.Filter):
        fired = False

        def filter(self, record):
            # The epoch-0 summary line ("Epoch 1: loss ...") is logged
            # after validation and BEFORE the boundary-save gate; a
            # synchronous self-SIGTERM here lands exactly at the boundary.
            if (not FireOnEpochSummary.fired
                    and record.getMessage().startswith("Epoch 1: loss")):
                FireOnEpochSummary.fired = True
                os.kill(os.getpid(), signal.SIGTERM)
            return True

    f = FireOnEpochSummary()
    _logging.getLogger().addFilter(f)
    try:
        r = train_mod.train(config)
    finally:
        _logging.getLogger().removeFilter(f)
    assert f.fired and r["preempted"]

    state_path = os.path.join(
        root, "weights", "experiments", "bitfit", "resume_state.npz")
    assert os.path.exists(state_path), "boundary preemption did not save"
    with np.load(state_path) as z:
        meta = json.loads(bytes(z["meta::json"]).decode())
    assert meta["epoch"] == 1 and meta["step_in_epoch"] == 0


def test_train_seed_drives_data_stream(tmp_path):
    """train.seed must reach the Loader: shuffle order (and host-side
    augmentation draws) differ across seeds (regression: every seed used to
    see the bit-identical stream, understating seed-ensemble variance)."""
    import train as train_mod

    root = str(tmp_path)
    csv_path, volumes = make_synth_dataset(root, n_train=8, n_val=2)

    def first_batch(seed):
        config = tiny_config(root, csv_path, volumes)
        config["train"]["seed"] = seed
        train_loader, _, _, _ = train_mod.make_loaders(config)
        train_loader.set_epoch(0)
        inputs, labels, _ = next(iter(train_loader))
        return np.asarray(inputs), np.asarray(labels)

    i0, l0 = first_batch(0)
    i0b, _ = first_batch(0)
    i1, l1 = first_batch(1)
    np.testing.assert_array_equal(i0, i0b)  # same seed -> same stream
    assert not (np.array_equal(i0, i1) and np.array_equal(l0, l1))

"""End-to-end training slice: SpatialNet-tiny on synthetic mixtures, sharded
over the 8-device CPU mesh — loss must decrease; val/predict paths run."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nbss_tpu.data import BatchLoader, DistributedSampler, SyntheticDataset
from nbss_tpu.io import Loss, Norm, STFT
from nbss_tpu.models import SpatialNet
from nbss_tpu.parallel import make_mesh
from nbss_tpu.train import TrainModule, Trainer


def tiny_module(num_channels=2, num_spk=2, n_fft=128):
    arch = SpatialNet(
        dim_input=2 * num_channels, dim_output=2 * num_spk, num_layers=2,
        dim_hidden=32, dim_ffn=64, num_heads=2, dim_squeeze=4,
        num_freqs=n_fft // 2 + 1, full_share=0,
    )
    return TrainModule(
        arch=arch,
        channels=tuple(range(num_channels)),
        ref_channel=0,
        stft=STFT(n_fft=n_fft, n_hop=n_fft // 2),
        norm=Norm(mode="frequency", online=True),
        loss=Loss(name="neg_si_sdr", pit=True),
    )


@pytest.fixture(scope="module")
def ds():
    return SyntheticDataset(num_items=64, num_spk=2, num_channels=2,
                            sample_rate=8000, audio_time_len=0.5)


def test_fit_loss_decreases(ds, cpu_devices, tmp_path):
    module = tiny_module()
    mesh = make_mesh(8)
    trainer = Trainer(
        module,
        optimizer=("Adam", {"lr": 2e-3}),
        lr_scheduler=("ExponentialLR", {"gamma": 0.99}),
        mesh=mesh,
        ckpt_dir=str(tmp_path / "ckpt"),
    )

    def loader():
        sampler = DistributedSampler(len(ds), seed=1, shuffle=True)
        return iter(BatchLoader(ds, batch_size=8, sampler=sampler))

    x0, _, _ = ds[(0, 0)]
    trainer.init(np.stack([x0]))

    h1 = trainer.fit(loader, max_epochs=1, steps_per_epoch=2)
    first = h1["train_loss"]
    h2 = trainer.fit(loader, max_epochs=6, steps_per_epoch=2)
    last = h2["train_loss"]
    assert np.isfinite(first) and np.isfinite(last)
    assert last < first, (first, last)

    # checkpoints written every epoch
    assert trainer.ckpt.latest_epoch() == 5


def test_validate_and_predict(ds, cpu_devices):
    module = tiny_module()
    trainer = Trainer(module, mesh=make_mesh(8))

    def loader():
        sampler = DistributedSampler(len(ds), seed=3, shuffle=False)
        return iter(BatchLoader(ds, batch_size=8, sampler=sampler))

    x0, _, _ = ds[(0, 0)]
    trainer.init(np.stack([x0]))
    logs = trainer.validate(lambda: iter(list(loader())[:1]))
    for key in ("val/neg_si_sdr", "val/metric", "val/sdr"):
        assert key in logs and np.isfinite(logs[key])

    x, ys, _ = next(loader())
    yhat = module.predict_step(trainer.params, jnp.asarray(x))
    assert yhat.shape == (8, 2, x.shape[-1])
    assert float(jnp.max(jnp.abs(yhat))) <= 1.0 + 1e-5


def test_checkpoint_restore_and_ensemble(ds, cpu_devices, tmp_path):
    module = tiny_module()
    trainer = Trainer(module, mesh=make_mesh(8), ckpt_dir=str(tmp_path / "ck"))

    def loader():
        sampler = DistributedSampler(len(ds), seed=1, shuffle=True)
        return iter(BatchLoader(ds, batch_size=8, sampler=sampler))

    x0, _, _ = ds[(0, 0)]
    trainer.init(np.stack([x0]))
    trainer.fit(loader, max_epochs=2, steps_per_epoch=1)
    params_before = jax.tree.map(np.asarray, trainer.params)

    t2 = Trainer(module, mesh=make_mesh(8), ckpt_dir=str(tmp_path / "ck"))
    t2.init(np.stack([x0]))
    t2.restore()
    for a, b in zip(jax.tree.leaves(params_before), jax.tree.leaves(t2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    assert t2.epoch == 2

    # ensemble of last 2 = average of epoch0/epoch1 params
    t2.restore(ensemble=2)
    p0 = t2.ckpt.restore(0, template={"params": params_before})["params"]
    p1 = t2.ckpt.restore(1, template={"params": params_before})["params"]
    avg = jax.tree.map(lambda a, b: (np.asarray(a) + np.asarray(b)) / 2, p0, p1)
    for a, b in zip(jax.tree.leaves(avg), jax.tree.leaves(t2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)

    # glob / explicit-path ensemble modes (reference ensemble.py:6-52)
    assert t2.ckpt._resolve_ensemble_epochs("epoch*") == [0, 1]
    assert t2.ckpt._resolve_ensemble_epochs(
        [str(tmp_path / "ck" / "epoch1")]) == [1]
    e = t2.ckpt.ensemble("epoch*", template={"params": params_before})
    assert e["epochs"] == [0, 1]
    for a, b in zip(jax.tree.leaves(avg), jax.tree.leaves(e["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_sampler_determinism():
    s1 = list(DistributedSampler(10, seed=7, shuffle=True, last_epoch=3))
    s2 = list(DistributedSampler(10, seed=7, shuffle=True, last_epoch=3))
    assert s1 == s2
    s3 = list(DistributedSampler(10, seed=7, shuffle=True, last_epoch=4))
    assert s1 != s3
    # rank-strided shard covers everything exactly once (after padding)
    a = DistributedSampler(10, seed=7, num_replicas=4, rank=0, last_epoch=0)
    parts = [
        [i for i, _ in DistributedSampler(10, seed=7, num_replicas=4, rank=r, last_epoch=0)]
        for r in range(4)
    ]
    assert sorted(sum(parts, []))[:10] != []
    assert {i for p in parts for i in p} == set(range(10))
    assert all(len(p) == 3 for p in parts)


def test_threaded_loader_matches_plain(ds):
    from nbss_tpu.data.prefetch import ThreadedLoader
    from nbss_tpu.data.sampler import BatchLoader, DistributedSampler

    s1 = DistributedSampler(len(ds), seed=5, shuffle=True, last_epoch=0)
    s2 = DistributedSampler(len(ds), seed=5, shuffle=True, last_epoch=0)
    plain = list(BatchLoader(ds, 4, s1))
    threaded = list(ThreadedLoader(ds, 4, s2, num_workers=3))
    assert len(plain) == len(threaded)
    for (x1, y1, p1), (x2, y2, p2) in zip(plain, threaded):
        np.testing.assert_array_equal(x1, x2)
        np.testing.assert_array_equal(y1, y2)


def test_validation_mchunk(ds, cpu_devices):
    module = tiny_module()
    import dataclasses

    module = dataclasses.replace(module, mchunk=(0.2, 0.2))
    x, ys, _ = next(iter(__import__("nbss_tpu.data", fromlist=["BatchLoader"]).BatchLoader(
        ds, 4, __import__("nbss_tpu.data", fromlist=["DistributedSampler"]).DistributedSampler(
            len(ds), seed=3, shuffle=False))))
    import jax, jax.numpy as jnp

    params = None
    trainer = Trainer(module, mesh=make_mesh(4))
    trainer.init(np.stack([ds[(0, 0)][0]]))
    logs = trainer._val_step if False else None
    trainer._build_steps()
    out = trainer._val_step(trainer.params, (jnp.asarray(x), jnp.asarray(ys)))
    chunk_keys = [k for k in out if "si_sdr_" in k]
    assert len(chunk_keys) == 2, list(out)


def test_unused_parameter_warning(ds, cpu_devices):
    import warnings
    import flax.linen as nn

    class ArchWithUnused(nn.Module):
        @nn.compact
        def __call__(self, x, deterministic=True):
            y = nn.Dense(4)(x)
            self.param("orphan", nn.initializers.ones, (3,))  # never used
            return y

    module = TrainModule(
        arch=ArchWithUnused(), channels=(0, 1), ref_channel=0,
        stft=STFT(n_fft=128, n_hop=64), norm=Norm(mode="frequency"),
        loss=Loss(name="neg_si_sdr", pit=True))
    trainer = Trainer(module, mesh=make_mesh(4), detect_unused_parameters=True)
    x0, _, _ = ds[(0, 0)]
    trainer.init(np.stack([x0]))

    def loader():
        sampler = DistributedSampler(len(ds), seed=1, shuffle=False)
        return iter(BatchLoader(ds, batch_size=4, sampler=sampler))

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        trainer.fit(loader, max_epochs=1, steps_per_epoch=1)
    assert any("unused parameter" in str(x.message) and "orphan" in str(x.message)
               for x in w), [str(x.message) for x in w]


def test_val_host_metrics(ds, cpu_devices):
    module = tiny_module()
    trainer = Trainer(module, mesh=make_mesh(4),
                      val_host_metrics=("STOI",), val_host_metrics_every=1,
                      val_host_metrics_batches=1)
    x0, _, _ = ds[(0, 0)]
    trainer.init(np.stack([x0]))

    def loader():
        sampler = DistributedSampler(len(ds), seed=1, shuffle=False)
        return iter(BatchLoader(ds, batch_size=4, sampler=sampler))

    h = trainer.fit(loader, lambda: iter(list(loader())[:1]),
                    max_epochs=1, steps_per_epoch=1)
    assert "val/STOI" in h and np.isfinite(h["val/STOI"]), h.keys()


@pytest.mark.parametrize("loss_name", ["cirm_mse", "cc_mse", "neg_sa_sdr", "neg_snr"])
def test_training_step_all_losses(ds, cpu_devices, loss_name):
    """TrainModule end-to-end with every loss family, incl. the cIRM mask
    path (whose predictions ride the UNNORMALIZED reference channel --
    SURVEY.md 'in-place quirks')."""
    import dataclasses

    module = tiny_module()
    module = dataclasses.replace(module, loss=Loss(name=loss_name, pit=True))
    x, ys, _ = next(iter(BatchLoader(
        ds, 4, DistributedSampler(len(ds), seed=3, shuffle=False))))
    params = module.arch.init(jax.random.PRNGKey(0), jnp.zeros((1, 65, 10, 4)))

    loss_val, grads = jax.value_and_grad(
        lambda p: module.training_step(p, (jnp.asarray(x), jnp.asarray(ys))))(params)
    assert np.isfinite(float(loss_val)), loss_name
    for leaf in jax.tree.leaves(grads):
        assert np.isfinite(np.asarray(leaf)).all(), loss_name

    # forward returns time-domain predictions of the mixture scale
    yhat, _ = module.forward(params, jnp.asarray(x))
    assert yhat.shape == (4, 2, x.shape[-1])
    assert np.isfinite(np.asarray(yhat)).all()


def test_profiler_capture(ds, cpu_devices, tmp_path):
    """trainer.profile_dir captures an XLA trace of the configured steps."""
    import os

    module = tiny_module()
    trainer = Trainer(module, mesh=make_mesh(8),
                      profile_dir=str(tmp_path / "prof"), profile_steps=(1, 3))

    def loader():
        sampler = DistributedSampler(len(ds), seed=1, shuffle=True)
        return iter(BatchLoader(ds, batch_size=8, sampler=sampler))

    x0, _, _ = ds[(0, 0)]
    trainer.init(np.stack([x0]))
    trainer.fit(loader, max_epochs=1, steps_per_epoch=4)
    found = [f for _, _, fs in os.walk(tmp_path / "prof") for f in fs]
    assert found, "no profiler trace files written"


def test_mesh_1d_vs_2d_equivalence(ds, cpu_devices):
    """A (data,) mesh and a (data, freq) mesh must produce the same loss and
    gradients for the same global batch (the freq axis only re-shards
    activations; GSPMD collectives must not change the math). VERDICT r2
    item 8."""
    import dataclasses

    from nbss_tpu.parallel.mesh import replicate, shard_batch

    module = tiny_module()
    xs, yss = [], []
    for i in range(8):
        x, ys, _ = ds[(i, i)]
        xs.append(x)
        yss.append(ys)
    batch = (jnp.asarray(np.stack(xs)), jnp.asarray(np.stack(yss)))

    params0 = None
    results = {}
    for name, mesh in {
        "1d": make_mesh(8),
        "2d": make_mesh(8, axes=("data", "freq"), shape=(4, 2)),
    }.items():
        mod = module
        if "freq" in mesh.axis_names:
            mod = dataclasses.replace(mod, freq_axis="freq")
        if params0 is None:
            x0, _, _ = ds[(0, 0)]
            X, _ = mod.stft.stft(jnp.asarray(x0[None, : len(mod.channels)]))
            B, C, F, T = X.shape
            params0 = mod.arch.init(jax.random.PRNGKey(0),
                                    jnp.zeros((B, F, T, 2 * C), jnp.float32))
        p = replicate(mesh, params0)
        sb = shard_batch(mesh, batch)
        with jax.sharding.set_mesh(mesh):
            loss, grads = jax.jit(jax.value_and_grad(
                lambda q: mod.training_step(q, sb)))(p)
        results[name] = (float(loss), jax.tree.map(np.asarray, grads))

    l1, g1 = results["1d"]
    l2, g2 = results["2d"]
    assert abs(l1 - l2) < 1e-5 * max(1.0, abs(l1)), (l1, l2)
    flat1 = jax.tree.leaves(g1)
    flat2 = jax.tree.leaves(g2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-4)

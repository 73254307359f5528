"""Worker for the 2-process data-parallel equivalence test.

Launched by tests/test_multihost.py as N subprocesses. Each process:
jax.distributed over CPU (4 local devices -> 4*N global), builds its
rank-strided data shard, runs `steps` jitted train steps on the global mesh,
then dumps final params + per-step losses to an npz for the parent to
compare against a single-process run (the DDP guarantee of the reference,
my_distributed_sampler.py:78 + implicit grad all-reduce).

Also exercises run_test's multi-host rank-merge path.
"""

import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)


def main():
    coord, nproc, pid, out_dir, steps = sys.argv[1:6]
    nproc, pid, steps = int(nproc), int(pid), int(steps)
    if nproc > 1:
        jax.distributed.initialize(coordinator_address=coord,
                                   num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc, (jax.process_count(), nproc)

    import numpy as np
    import jax.numpy as jnp

    from nbss_tpu.data.sampler import BatchLoader, DistributedSampler
    from nbss_tpu.data.synthetic import SyntheticDataset
    from nbss_tpu.io import Loss, Norm, STFT
    from nbss_tpu.models import SpatialNet
    from nbss_tpu.parallel.mesh import make_mesh
    from nbss_tpu.train import TrainModule, Trainer

    global_batch = 8
    ds = SyntheticDataset(num_items=16, num_spk=2, num_channels=2,
                          sample_rate=8000, audio_time_len=1.0)
    arch = SpatialNet(dim_input=4, dim_output=4, num_layers=1, dim_hidden=16,
                      dim_ffn=32, num_heads=2, kernel_size=(3, 3),
                      conv_groups=(2, 2), dim_squeeze=4, num_freqs=129,
                      full_share=0)
    module = TrainModule(arch=arch, channels=(0, 1), ref_channel=0,
                         stft=STFT(n_fft=256, n_hop=128),
                         norm=Norm(mode="frequency"),
                         loss=Loss(name="neg_si_sdr", pit=True))
    trainer = Trainer(module, mesh=make_mesh(),
                      optimizer=("Adam", {"lr": 1e-3}), lr_scheduler=None,
                      seed=7)

    def loader():
        sampler = DistributedSampler(
            len(ds), seed=3, shuffle=True,
            num_replicas=jax.process_count(), rank=jax.process_index(),
            last_epoch=0)
        return iter(BatchLoader(ds, global_batch // nproc, sampler))

    x0, _, _ = ds[(0, 0)]
    trainer.init(np.stack([x0]))
    hist = trainer.fit(loader, max_epochs=1, steps_per_epoch=steps)

    def host_value(a):
        # params are fully replicated -> any addressable shard is the value
        return np.asarray(a.addressable_data(0) if isinstance(a, jax.Array) else a)

    params_host = jax.tree.map(host_value, trainer.params)
    flat = np.concatenate([np.ravel(v) for v in jax.tree.leaves(params_host)])

    # exercise the multi-host test merge (runner.py rank-shard files)
    from nbss_tpu.eval.runner import run_test

    test_sampler = DistributedSampler(
        len(ds), seed=5, shuffle=False,
        num_replicas=jax.process_count(), rank=jax.process_index(),
        last_epoch=0)
    test_loader = BatchLoader(ds, 1, test_sampler, drop_last=False)
    res = run_test(trainer, module, test_loader,
                   os.path.join(out_dir, "testdir"),
                   metrics=["SI_SDR"], write_examples=0)

    np.savez(os.path.join(out_dir, f"out_rank{pid}.npz"),
             params=flat, loss=hist["train_loss"],
             num_items=res.get("num_items", -1))
    print("worker done", pid, flush=True)


if __name__ == "__main__":
    main()

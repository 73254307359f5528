"""RIR simulation: physics checks (delay, amplitude, T60 decay), config
sampler invariants, trajectory properties, end-to-end generation."""

import numpy as np
import pytest

from nbss_tpu.sim import (
    RirConfigSampler,
    beta_from_t60,
    four_points_sin_trajectory,
    render_room,
    rotate_positions,
    sabine_t60,
    simulate_direct_path,
    simulate_rir,
)

FS = 8000
C = 343.0


def test_direct_path_delay_and_amplitude():
    room = [5.0, 4.0, 3.0]
    src = [1.0, 2.0, 1.5]
    rcv = [[3.0, 2.0, 1.5]]
    rir = simulate_direct_path(room, src, rcv, FS)
    assert rir.shape == (1, 1, int(0.1 * FS))
    d = 2.0
    expected_delay = d / C * FS  # fractional
    peak = int(np.argmax(np.abs(rir[0, 0])))
    assert abs(peak - expected_delay) <= 1
    # bandlimited impulse: sum equals the 1/(4 pi d) DC gain
    np.testing.assert_allclose(rir[0, 0].sum(), 1 / (4 * np.pi * d), rtol=1e-3)


def test_multi_mic_relative_delays():
    room = [6.0, 5.0, 3.0]
    src = [1.0, 2.5, 1.5]
    rcv = [[3.0, 2.5, 1.5], [4.0, 2.5, 1.5]]  # 2m and 3m away
    rir = simulate_direct_path(room, src, rcv, FS)
    p0 = int(np.argmax(np.abs(rir[0, 0])))
    p1 = int(np.argmax(np.abs(rir[0, 1])))
    assert abs((p1 - p0) - 1.0 / C * FS) <= 1


def _schroeder_t60(h: np.ndarray, fs: int) -> float:
    e = np.cumsum(h[::-1] ** 2)[::-1]
    e = 10 * np.log10(e / e[0] + 1e-12)
    # fit the -5..-25 dB decay range, extrapolate to -60
    i5 = int(np.argmax(e <= -5))
    i25 = int(np.argmax(e <= -25))
    slope = (e[i25] - e[i5]) / ((i25 - i5) / fs)  # dB per second
    return -60.0 / slope


def test_reverberant_t60():
    room = [5.0, 4.0, 3.0]
    t60 = 0.25
    rir = simulate_rir(room, [[1.5, 1.0, 1.5]], [[3.5, 2.8, 1.4]], t60, FS)
    h = rir[0, 0]
    assert np.isfinite(h).all()
    est = _schroeder_t60(h, FS)
    assert abs(est - t60) / t60 < 0.35, (est, t60)
    # reverberant energy must exceed direct-path energy contribution
    dp = simulate_direct_path(room, [[1.5, 1.0, 1.5]], [[3.5, 2.8, 1.4]], FS)
    assert (h**2).sum() > (dp[0, 0] ** 2).sum() * 1.5


def test_beta_from_t60_consistency():
    room = [5.0, 4.0, 3.0]
    beta, err = beta_from_t60(room, 0.3)
    assert err < 0.01
    np.testing.assert_allclose(sabine_t60(room, beta), 0.3, rtol=0.05)


def test_rotate_preserves_distances(rng):
    pos = rng.standard_normal((5, 3))
    out = rotate_positions(pos, x_angle=0.3, y_angle=1.1, z_angle=2.0)
    d0 = np.linalg.norm(pos[:, None] - pos[None], axis=-1)
    d1 = np.linalg.norm(out[:, None] - out[None], axis=-1)
    np.testing.assert_allclose(d0, d1, atol=1e-9)


def test_config_sampler_static():
    s = RirConfigSampler(spk_num=2, noise_num=1, RT60_lim=(0.15, 0.4), seed=7)
    for idx in range(3):
        par = s.sample(idx)
        room = np.array(par["room_sz"])
        assert par["pos_src"].shape == (2, 3)
        assert (par["pos_src"] >= 0).all() and (par["pos_src"] <= room).all()
        assert par["pos_rcv"].shape == (6, 3)
        assert (par["pos_rcv"] >= 0).all() and (par["pos_rcv"] <= room).all()
        assert par["pos_noise"].shape == (1, 3)
        assert 0.15 <= par["RT60"] <= 0.4
        # deterministic per (seed, index)
        par2 = RirConfigSampler(spk_num=2, noise_num=1, RT60_lim=(0.15, 0.4), seed=7).sample(idx)
        np.testing.assert_array_equal(par["pos_src"], par2["pos_src"])


@pytest.mark.parametrize("equal_dist", [False, True])
def test_trajectory(rng, equal_dist):
    room = [6.0, 5.0, 3.0]
    rcv = np.array([[3.0, 2.5, 1.2]])
    for _ in range(5):
        traj = four_points_sin_trajectory(
            room, rcv, min_src_array_dist=np.array([0.5, 0.5, 0.0]),
            min_src_boundary_dist=np.array([0.5, 0.5, 0.0]), src_z=1.5,
            desired_dist_pts=0.1, equal_dist=equal_dist, rng=rng)
        if traj is not None:
            break
    assert traj is not None and len(traj) > 20
    assert (traj >= 0).all() and (traj <= np.array([room])).all()
    steps = np.linalg.norm(np.diff(traj, axis=0), axis=-1)
    if equal_dist:  # spacing ~ 0.1 m except at the 4 segment joints
        assert np.median(np.abs(steps - 0.1)) < 0.03, np.median(steps)
    assert (traj[:, 2] == 1.5).all()


def test_render_room_static(tmp_path):
    s = RirConfigSampler(spk_num=2, noise_num=1, RT60_lim=(0.15, 0.2), seed=3)
    par = s.sample(0)
    path = render_room(par, FS, str(tmp_path), "train")
    d = np.load(path, allow_pickle=True)
    assert d["rir"].shape[0] == 2 and d["rir"].shape[1] == 6
    assert d["rir_dp"].shape == (2, 6, int(0.1 * FS))
    assert d["rir_noise"].shape[0] == 1
    assert int(d["fs"]) == FS


def test_render_room_trajectory(tmp_path):
    s = RirConfigSampler(spk_num=1, noise_num=0, RT60_lim=(0.13, 0.16),
                         trajectory=("4points+sin", 0.5), seed=5)
    par = s.sample(0)
    path = render_room(par, FS, str(tmp_path), "train", split_trajectory=8)
    d = np.load(path, allow_pickle=True)
    import os

    rir_file = os.path.join(os.path.dirname(path), str(d["rir"][0]))
    r = np.load(rir_file)
    n_pts = len(par["pos_src"][0])
    assert r.shape[0] == n_pts and r.shape[1] == 6


def test_migrate_splits(tmp_path):
    """Growing rir_nums must relocate rooms whose global index now belongs
    to a different split (train/val leakage guard, generate.py)."""
    import os

    from nbss_tpu.sim.generate import migrate_splits

    # simulate a previous 8/2/2 corpus: train 0-7, validation 8-9, test 10-11
    # (room 3 is a trajectory room with per-source sidecars)
    layout = {"train": range(0, 8), "validation": range(8, 10),
              "test": range(10, 12)}
    for setdir, idxs in layout.items():
        d = tmp_path / setdir
        d.mkdir()
        for i in idxs:
            (d / f"{i}.npz").write_bytes(b"x")
    for side in ("3_rir_0.npy", "3_rir_dp_0.npz", "3_rir_1.npy"):
        (tmp_path / "train" / side).write_bytes(b"x")

    # grow to 32/6/6: old validation/test rooms 8-11 all become train rooms
    moved = migrate_splits(str(tmp_path), (32, 6, 6))
    assert moved == 4
    for i in range(12):
        assert (tmp_path / "train" / f"{i}.npz").exists(), i
    assert not any((tmp_path / "validation").glob("*.npz"))
    assert not any((tmp_path / "test").glob("*.npz"))

    # shrink to 2/1/1: 0-1 train, 2 validation, 3 test, rest quarantined;
    # room 3's sidecars must travel with its metadata
    moved = migrate_splits(str(tmp_path), (2, 1, 1))
    assert (tmp_path / "train" / "0.npz").exists()
    assert (tmp_path / "train" / "1.npz").exists()
    assert (tmp_path / "validation" / "2.npz").exists()
    assert (tmp_path / "test" / "3.npz").exists()
    assert (tmp_path / "test" / "3_rir_0.npy").exists()
    assert (tmp_path / "test" / "3_rir_dp_0.npz").exists()
    assert (tmp_path / "_excess" / "4.npz").exists()
    assert (tmp_path / "_excess" / "11.npz").exists()
    # idempotent
    assert migrate_splits(str(tmp_path), (2, 1, 1)) == 0

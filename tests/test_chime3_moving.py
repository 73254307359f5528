"""CHiME3-moving over a synthetic fixture (wsj0 + CHiME3 backgrounds +
trajectory RIRs rendered by nbss_tpu.sim)."""

import numpy as np
import pytest

from nbss_tpu.data.chime3_moving import CHiME3MovingDataset
from nbss_tpu.sim import RirConfigSampler, render_room
from nbss_tpu.utils.audio_io import write_audio


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("chime3")
    rng = np.random.default_rng(0)

    wsj0 = root / "wsj0"
    for sub, spks in (("si_tr_s", ["011", "012"]), ("si_dt_05", ["020"]),
                      ("si_et_05", ["030"])):
        for spk in spks:
            d = wsj0 / sub / spk
            d.mkdir(parents=True)
            for u in range(2):
                wav = (rng.standard_normal(8000 * 2) * 0.1).astype(np.float32)
                write_audio(str(d / f"{spk}x{u}.wav"), wav, 8000)

    chime3 = root / "CHiME3"
    bg = chime3 / "data" / "audio" / "16kHz" / "backgrounds"
    bg.mkdir(parents=True)
    for ch in range(1, 7):
        wav = (rng.standard_normal(16000 * 30) * 0.05).astype(np.float32)
        write_audio(str(bg / f"BGD_CAF.CH{ch}.wav"), wav, 16000)

    rirs = root / "rirs"
    sampler = RirConfigSampler(
        spk_num=1, noise_num=0, RT60_lim=(0.13, 0.16), mic_num=6,
        trajectory=("4points+sin", 0.7), seed=11, fs=8000)
    par = sampler.sample(0)
    render_room(par, 8000, str(rirs), "train", split_trajectory=16)
    # reuse the same rendered room for val/test (fixture speed)
    import shutil

    for sub in ("validation", "test"):
        shutil.copytree(rirs / "train", rirs / sub)
    np.savez(rirs / "rir_cfg.npz",
             args=np.array({"trajectory": ("4points+sin", 0.5)}, dtype=object))
    return str(wsj0), str(chime3), str(rirs)


def test_moving_item(corpus):
    wsj0, chime3, rirs = corpus
    ds = CHiME3MovingDataset(
        wsj0_dir=wsj0, chime3_dir=chime3, rir_dir=rirs, target="direct_path",
        dataset="train_moving(0.5,1.0)", audio_time_len=1.0)
    mix, targets, paras = ds[(0, 42)]
    assert mix.shape == (6, 8000) and targets.shape == (1, 6, 8000)
    assert np.isfinite(mix).all() and np.isfinite(targets).all()
    assert paras["moving"] is True
    # determinism
    mix2, _, _ = ds[(0, 42)]
    np.testing.assert_array_equal(mix, mix2)


def test_static_item_from_trajectory(corpus):
    wsj0, chime3, rirs = corpus
    ds = CHiME3MovingDataset(
        wsj0_dir=wsj0, chime3_dir=chime3, rir_dir=rirs, target="revb_image",
        dataset="val", audio_time_len=1.0)
    mix, targets, paras = ds[(0, 7)]
    assert paras["moving"] is False
    assert mix.shape == (6, 8000)
    assert np.abs(mix).max() <= 0.9 + 1e-4

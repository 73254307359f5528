"""SmsWsjPlusDataset end-to-end over a tiny synthetic corpus fixture."""

import json

import numpy as np
import pytest

from nbss_tpu.data.sms_wsj_plus import SmsWsjPlusDataModule, SmsWsjPlusDataset
from nbss_tpu.utils.audio_io import write_audio


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("smswsj")
    fs = 8000
    rng = np.random.default_rng(0)

    wsj = root / "sms_wsj"
    (wsj / "wsj_8k_zeromean").mkdir(parents=True)
    info = {"datasets": {d: {} for d in ("train_si284", "cv_dev93", "test_eval92")}}
    for d in info["datasets"]:
        for k in range(3):
            key = f"{d}_{k}"
            srcs = []
            for s in range(2):
                name = f"wsj_8k_zeromean/{key}_{s}.wav"
                wav = (rng.standard_normal(fs * 3) * 0.1).astype(np.float32)
                write_audio(str(wsj / name), wav, fs)
                srcs.append(str(wsj / name))
            info["datasets"][d][key] = {"audio_path": {"original_source": srcs}}
    with open(wsj / "sms_wsj.json", "w") as f:
        json.dump(info, f)

    rirs = root / "rirs"
    for sub in ("train", "validation", "test"):
        (rirs / sub).mkdir(parents=True)
        for r in range(2):
            n_src, n_mic, L = 3, 4, 800
            rir = (rng.standard_normal((n_src, n_mic, L)) * 0.02).astype(np.float32)
            rir[:, :, 40] = 1.0
            rir_dp = np.zeros_like(rir)
            rir_dp[:, :, 40] = 1.0
            pos_rcv = np.stack([np.zeros(4), np.arange(4) * 0.05, np.full(4, 1.5)], -1)
            np.savez(
                rirs / sub / f"rir_{r}.npz", fs=fs, RT60=0.3,
                rir=rir, rir_dp=rir_dp,
                pos_src=rng.uniform(0, 5, (n_src, 3)), pos_rcv=pos_rcv,
            )
    return str(wsj), str(rirs)


@pytest.mark.parametrize("target", ["direct_path", "revb_image", "RTS_0.1s"])
def test_getitem(corpus, target):
    wsj, rirs = corpus
    ds = SmsWsjPlusDataset(
        sms_wsj_dir=wsj, rir_dir=rirs, target=target, dataset="train_si284",
        ovlp="mid", audio_time_len=2.0, snr=(10, 20), noise_type=("white",))
    mix, targets, paras = ds[(0, 123)]
    assert mix.shape == (4, 16000)
    assert targets.shape == (2, 4, 16000)
    assert np.isfinite(mix).all() and np.isfinite(targets).all()
    assert abs(np.abs(mix).max() - 0.9) < 1e-3 or abs(np.abs(targets).max() - 0.9) < 1e-3
    assert abs(paras["snr"] - np.clip(paras["snr"], 10 - 0.5, 20 + 0.5)) < 1e-6

    # determinism: same (index, seed) -> identical sample
    mix2, targets2, _ = ds[(0, 123)]
    np.testing.assert_array_equal(mix, mix2)
    np.testing.assert_array_equal(targets, targets2)
    # different seed -> different sample
    mix3, _, _ = ds[(0, 124)]
    assert not np.array_equal(mix, mix3)


def test_babble_noise(corpus):
    wsj, rirs = corpus
    ds = SmsWsjPlusDataset(
        sms_wsj_dir=wsj, rir_dir=rirs, target="direct_path", dataset="cv_dev93",
        ovlp="headtail", audio_time_len=1.0, noise_type=("babble",))
    mix, targets, paras = ds[(1, 7)]
    assert paras["noise_type"] == "babble"
    assert mix.shape == (4, 8000)


def test_datamodule(corpus):
    wsj, rirs = corpus
    dm = SmsWsjPlusDataModule(
        sms_wsj_dir=wsj, rir_dir=rirs, audio_time_len=(1.0, 1.0, None, None),
        noise_type=("white",), batch_size=(2, 1), num_replicas=1, rank=0)
    batch = next(iter(dm.train_dataloader(epoch=0)))
    x, ys, paras = batch
    assert x.shape == (2, 4, 8000) and ys.shape == (2, 2, 4, 8000)
    assert len(paras) == 2
    tb = next(iter(dm.test_dataloader()))
    assert tb[0].shape[0] == 1  # full-length, batch 1

"""SMS-WSJ reader over a synthetic fixture; the fixture's observation wavs
are themselves produced by scenario_map, so the dataset's regeneration path
is checked for bit-consistency (mirroring reference sms_wsj.py:197-198)."""

import json

import numpy as np
import pytest

from nbss_tpu.data.sms_wsj import (
    SmsWsjDataset,
    example_id_rng,
    extract_piece,
    rir_start_sample,
    scenario_map,
)
from nbss_tpu.utils.audio_io import write_audio

FS = 8000


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("smswsj_official")
    rng = np.random.default_rng(0)
    ds = "cv_dev93"
    info = {"datasets": {ds: {}}}
    (root / "wsj_8k_zeromean").mkdir()
    (root / "rirs" / ds).mkdir(parents=True)
    (root / "rirs_direct_path" / ds).mkdir(parents=True)
    (root / "observation" / ds).mkdir(parents=True)
    (root / "early" / ds).mkdir(parents=True)

    for k in range(2):
        eid = f"ex_{k}"
        srcs, rirs, dps, src_paths, rir_paths = [], [], [], [], []
        lens = [FS * 2, FS * 2 - 777]
        offsets = [0, 500]
        for s in range(2):
            wav = (rng.standard_normal(lens[s]) * 0.1).astype(np.float64)
            p = f"wsj_8k_zeromean/{eid}_{s}.wav"
            write_audio(str(root / p), wav.astype(np.float32), FS)
            srcs.append(wav)
            src_paths.append(str(root / p))
            rir = np.zeros((6, 800))
            d = 40 + s * 7
            rir[:, d] = 1.0
            rir[:, d + 50:] += rng.standard_normal((6, 750 - d)) * 0.05 * np.exp(
                -np.arange(750 - d) / 300)
            rp = f"rirs/{ds}/{eid}_{s}.wav"
            write_audio(str(root / rp), rir.T.astype(np.float32), FS)
            rirs.append(rir)
            rir_paths.append(str(root / rp))
            dp = np.zeros_like(rir)
            dp[:, d] = 1.0
            write_audio(str(root / f"rirs_direct_path/{ds}/{eid}_{s}.wav"),
                        dp.T.astype(np.float32), FS)
            dps.append(dp)

        T = max(lens[s] + offsets[s] for s in range(2))
        ex = {
            "example_id": eid,
            "num_speakers": 2,
            "log_weights": [0.8, -0.8],
            "offset": offsets,
            "num_samples": {"observation": T, "original_source": lens},
            "sound_decay_time": 0.25,
            "audio_path": {"original_source": src_paths, "rir": rir_paths},
        }
        # render the official observation + early targets with scenario_map
        work = dict(ex)
        work["audio_data"] = {"original_source": [s.copy() for s in srcs],
                              "rir": np.stack(rirs)}
        work = scenario_map(work, rir_target=np.stack(dps))
        write_audio(str(root / "observation" / ds / f"{eid}.wav"),
                    work["audio_data"]["observation"].T.astype(np.float32), FS)
        for s in range(2):
            write_audio(str(root / "early" / ds / f"{eid}_{s}.wav"),
                        work["audio_data"]["speech_target"][s].T.astype(np.float32), FS)
        info["datasets"][ds][eid] = ex

    with open(root / "sms_wsj.json", "w") as f:
        json.dump(info, f)
    return str(root), ds


def test_helpers():
    h = np.zeros(100)
    h[30] = 1.0
    h[25] = 0.2
    assert rir_start_sample(h) == 25
    assert example_id_rng("x").get_state()[1][0] == example_id_rng("x").get_state()[1][0]
    x = np.arange(10.0)[None]
    assert extract_piece(x, 2, 8).shape == (1, 8)
    np.testing.assert_array_equal(extract_piece(x, -3, 5)[0], [3, 4, 5, 6, 7])


def test_direct_path_regeneration_matches_observation(corpus):
    root, ds = corpus
    dset = SmsWsjDataset(sms_wsj_dir=root, target="direct_path", dataset=ds,
                         check_regenerated=True)
    mix, target, paras = dset[(0, 5)]
    assert mix.shape[0] == 6 and target.shape[:2] == (2, 6)
    assert np.isfinite(mix).all()
    # direct-path target == early-file target written by the fixture
    from nbss_tpu.utils.audio_io import read_audio

    e0, _ = read_audio(str(f"{root}/early/{ds}/{paras['wavname'].replace('.wav', '_0.wav')}"),
                       always_2d=True)
    np.testing.assert_allclose(target[0], e0.T, atol=1e-5)


def test_precomputed_and_crop(corpus):
    root, ds = corpus
    dset = SmsWsjDataset(sms_wsj_dir=root, target="early", dataset=ds,
                         audio_time_len=1.0)
    mix, target, _ = dset[(1, 9)]
    assert mix.shape == (6, FS)
    assert target.shape == (2, 6, FS)


def test_rts_and_image_targets(corpus):
    root, ds = corpus
    for target in ("RTS_0.1s", "image", "direct_path_2ms"):
        dset = SmsWsjDataset(sms_wsj_dir=root, target=target, dataset=ds)
        mix, tgt, _ = dset[(0, 3)]
        assert np.isfinite(tgt).all()
        assert tgt.shape[0] == 2

"""LibriCSS / REVERB / WHAMR / spatialized-wsj0-mix over synthetic fixtures."""

import numpy as np
import pytest

from nbss_tpu.sim import RirConfigSampler, render_room
from nbss_tpu.utils.audio_io import write_audio


@pytest.fixture(scope="module")
def rir_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("rirs16k")
    sampler = RirConfigSampler(spk_num=3, noise_num=0, RT60_lim=(0.13, 0.16),
                               arr_geometry="libricss", fs=16000, seed=1)
    par = sampler.sample(0)
    render_room(par, 16000, str(root), "train")
    import shutil

    for sub in ("validation", "test"):
        shutil.copytree(root / "train", root / sub)
    return str(root)


def test_libricss_sim(tmp_path, rir_root, rng):
    from nbss_tpu.data.libricss import LibriCSSDataset

    ls = tmp_path / "librispeech" / "train-clean-100" / "19" / "198"
    ls.mkdir(parents=True)
    for u in range(3):
        wav = (rng.standard_normal(16000 * 2) * 0.1).astype(np.float32)
        write_audio(str(ls / f"19-198-{u:04d}.wav"), wav, 16000)
    nd = tmp_path / "noise"
    nd.mkdir()
    write_audio(str(nd / "n0.wav"),
                (rng.standard_normal((16000 * 16, 2)) * 0.05).astype(np.float32), 16000)

    ds = LibriCSSDataset(
        librispeech_dir=str(tmp_path / "librispeech"), rir_dir=rir_root,
        noise_dir=str(nd), dataset="SimTrain", audio_time_len=1.0,
        spk1_prob=0.0, spk2_prob=1.0)
    mix, targets, paras = ds[(0, 3)]
    assert mix.shape == (7, 16000)
    assert targets.shape[0] == 2 and np.isfinite(targets).all()
    assert paras["num_spk"] == 2

    # 3-speaker packed into 2 streams
    ds3 = LibriCSSDataset(
        librispeech_dir=str(tmp_path / "librispeech"), rir_dir=rir_root,
        noise_dir=str(nd), dataset="SimTrain", audio_time_len=1.0,
        spk1_prob=0.0, spk2_prob=0.0)
    mix, targets, paras = ds3[(0, 11)]
    assert paras["num_spk"] == 3 and targets.shape[0] == 2

    # 1-speaker pads a zero stream
    ds1 = LibriCSSDataset(
        librispeech_dir=str(tmp_path / "librispeech"), rir_dir=rir_root,
        noise_dir=str(nd), dataset="SimTrain", audio_time_len=1.0,
        spk1_prob=1.0, spk2_prob=0.0)
    mix, targets, paras = ds1[(0, 13)]
    assert paras["num_spk"] == 1
    assert np.abs(targets[1]).max() == 0.0


def test_reverb_trainval(tmp_path, rir_root, rng):
    from nbss_tpu.data.reverb import ReverbTrainValDataset, gen_obs

    wsjcam0 = tmp_path / "wsjcam0" / "data" / "primary_microphone" / "si_tr"
    wsjcam0.mkdir(parents=True)
    for u in range(2):
        wav = (rng.standard_normal(16000 * 2) * 0.1).astype(np.float32)
        write_audio(str(wsjcam0 / f"c0{u}.wav"), wav, 16000)
    noise_dir = (tmp_path / "Reverb" / "reverb_tools_for_Generate_mcTrainData" / "NOISE")
    noise_dir.mkdir(parents=True)
    write_audio(str(noise_dir / "Noise_SmallRoom1_1.wav"),
                (rng.standard_normal((16000 * 3, 7)) * 0.05).astype(np.float32), 16000)

    ds = ReverbTrainValDataset(
        wsjcam0_dir=str(tmp_path / "wsjcam0"), reverb_dir=str(tmp_path / "Reverb"),
        dataset="train_with_simulated_rir", rir_dir=rir_root, audio_time_len=1.0)
    noisy, dp, paras = ds[(0, 17)]
    assert noisy.shape == (7, 16000)
    assert dp.shape == (1, 7, 16000)
    assert np.isfinite(noisy).all()
    noisy2, _, _ = ds[(0, 17)]
    np.testing.assert_array_equal(noisy, noisy2)

    # gen_obs SNR convention check: direct+early SNR close to requested
    x = rng.standard_normal(16000).astype(np.float64)
    RIR = np.zeros((1600, 2))
    RIR[100, :] = 1.0
    NOISE = rng.standard_normal((32000, 2)) * 0.3
    y = gen_obs(x, RIR, NOISE, SNRdB=10.0)
    assert y.shape[0] == 2 and np.isfinite(y).all()


def test_reverb_real_rir_and_room_match(tmp_path, rir_root, rng):
    """Released measured-RIR branch + room-size-vs-T60 noise selection
    (reference reverb.py:102-149)."""
    from nbss_tpu.data.reverb import ReverbTrainValDataset

    wsjcam0 = tmp_path / "wsjcam0" / "data" / "primary_microphone" / "si_tr"
    wsjcam0.mkdir(parents=True)
    write_audio(str(wsjcam0 / "c00.wav"),
                (rng.standard_normal(16000 * 2) * 0.1).astype(np.float32), 16000)
    tools = tmp_path / "Reverb" / "reverb_tools_for_Generate_mcTrainData"
    (tools / "NOISE").mkdir(parents=True)
    for room in ("SmallRoom1", "MediumRoom1", "LargeRoom1"):
        write_audio(str(tools / "NOISE" / f"Noise_{room}_1.wav"),
                    (rng.standard_normal((16000 * 3, 7)) * 0.05).astype(np.float32),
                    16000)
    (tools / "RIR").mkdir()
    rir = np.zeros((3200, 7), np.float32)
    rir[100 + np.arange(7) % 3, np.arange(7)] = 1.0
    rir[500:800:50, :] = 0.2
    write_audio(str(tools / "RIR" / "RIR_SmallRoom1_near_AnglA.wav"), rir, 16000)

    ds = ReverbTrainValDataset(
        wsjcam0_dir=str(tmp_path / "wsjcam0"), reverb_dir=str(tmp_path / "Reverb"),
        dataset="train_with_simulated_rir", rir_dir=rir_root, audio_time_len=1.0,
        use_real_rir_prop=1.0, noise_room_match=True)
    noisy, dp, paras = ds[(0, 5)]
    assert noisy.shape == (7, 16000) and np.isfinite(noisy).all()
    assert dp.shape == (1, 7, 16000) and np.abs(dp).max() > 0
    # noise grouping exists: 3 room groups + combined
    assert len(ds.noise_groups) == 4
    assert all(len(g) == 1 for g in ds.noise_groups[:3])

    # simulated-RIR branch with room-matched noise (T60 ~0.15 -> SmallRoom)
    ds2 = ReverbTrainValDataset(
        wsjcam0_dir=str(tmp_path / "wsjcam0"), reverb_dir=str(tmp_path / "Reverb"),
        dataset="train_with_simulated_rir", rir_dir=rir_root, audio_time_len=1.0,
        use_real_rir_prop=0.0, noise_room_match=True)
    noisy, dp, paras = ds2[(0, 7)]
    assert np.isfinite(noisy).all()


def test_reverb_simdtetmc(tmp_path, rng):
    """Synthesized SimDt/SimEt multichannel sets (reference reverb.py:365-527)."""
    from nbss_tpu.data.reverb import ReverbSimDtEtMCDataset

    wsjcam0 = tmp_path / "wsjcam0" / "data" / "primary_microphone" / "si_dt" / "c02"
    wsjcam0.mkdir(parents=True)
    for u in range(2):
        write_audio(str(wsjcam0 / f"c02{u}.wav"),
                    (rng.standard_normal(16000 * 2) * 0.1).astype(np.float32), 16000)
    tools = tmp_path / "Reverb" / "reverb_tools_for_Generate_SimData"
    (tools / "NOISE").mkdir(parents=True)
    write_audio(str(tools / "NOISE" / "Noise_SimRoom1_1.wav"),
                (rng.standard_normal((16000 * 3, 8)) * 0.05).astype(np.float32), 16000)
    (tools / "RIR").mkdir()
    rir = np.zeros((3200, 8), np.float32)
    rir[100, :] = 1.0
    write_audio(str(tools / "RIR" / "RIR_SimRoom1_near_AnglA.wav"), rir, 16000)
    write_audio(str(tools / "RIR" / "RIR_SimRoom1_far_AnglA.wav"), rir, 16000)

    ds = ReverbSimDtEtMCDataset(
        wsjcam0_dir=str(tmp_path / "wsjcam0"), reverb_dir=str(tmp_path / "Reverb"),
        dataset="SimDtMC")
    assert len(ds) == 4  # 2 sources x (far + near)
    noisy, dp, paras = ds[(1, 9)]
    assert noisy.shape[0] == 8 and dp.shape[:2] == (1, 8)
    assert np.isfinite(noisy).all() and np.abs(dp).max() > 0
    # multichannel reference distinguishes it from ReverbEtDataset
    noisy2, _, _ = ds[(1, 9)]
    np.testing.assert_array_equal(noisy, noisy2)


def test_reverb_et(tmp_path, rng):
    from nbss_tpu.data.reverb import ReverbEtDataset

    d = tmp_path / "Reverb" / "MC_WSJ_AV_Eval" / "audio"
    d.mkdir(parents=True)
    write_audio(str(d / "T1.wav"),
                (rng.standard_normal((16000, 8)) * 0.1).astype(np.float32), 16000)
    ds = ReverbEtDataset(reverb_dir=str(tmp_path / "Reverb"), dataset="Et_real")
    mix, tgt, paras = ds[(0, 0)]
    assert mix.shape == (8, 16000) and tgt is None


def test_whamr_and_spwsj_readers(tmp_path, rng):
    from nbss_tpu.data.whamr import WHAMRDataset
    from nbss_tpu.data.spatialized_wsj0_mix import SpatializedWSJMixDataset

    for name, subs in (("whamr/wav8k/min/tr",
                        ("mix_both_reverb", "s1_anechoic", "s2_anechoic")),
                       ("spwsj/2speakers_reverb/wav8k/min/tr", ("mix", "s1", "s2"))):
        for sub in subs:
            d = tmp_path / name / sub
            d.mkdir(parents=True)
            write_audio(str(d / "u0.wav"),
                        (rng.standard_normal((8000, 2)) * 0.1).astype(np.float32), 8000)

    wh = WHAMRDataset(whamr_dir=str(tmp_path / "whamr"), dataset="tr",
                      audio_time_len=0.5)
    mix, tgt, _ = wh[(0, 4)]
    assert mix.shape == (2, 4000) and tgt.shape == (2, 2, 4000)

    sp = SpatializedWSJMixDataset(sp_wsj0_dir=str(tmp_path / "spwsj"), dataset="tr",
                                  audio_time_len=0.5)
    mix, tgt, _ = sp[(0, 4)]
    assert mix.shape == (2, 4000) and tgt.shape == (2, 2, 4000)


def test_spk4_dataset(tmp_path, rng):
    from nbss_tpu.data.spk4_wsj0_mix_sp import Spk4Wsj0MixSpDataset

    wsj0 = tmp_path / "wsj0"
    for spk in ("s1", "s2", "s3", "s4"):
        d = wsj0 / "si_tr_s" / spk
        d.mkdir(parents=True)
        for u in range(2):
            wav = (rng.standard_normal(16000 * 5) * 0.1).astype(np.float32)
            write_audio(str(d / f"{spk}u{u}.wav"), wav, 16000)
    rd = tmp_path / "rirs4"
    rd.mkdir()
    rir = np.zeros((2, 4, 400), np.float32)
    rir[:, :, 50] = 1.0
    np.savez(rd / "r0.npz", speech_rir=rir, sr=16000)

    ds = Spk4Wsj0MixSpDataset(
        spks=("si_tr_s/s1", "si_tr_s/s2", "si_tr_s/s3", "si_tr_s/s4"),
        wsj0_dir=str(wsj0), rir_dir=str(rd), audio_time_len="nmix 2")
    assert len(ds) > 0
    mix, ys, paras = ds[{"speech_index": 0, "rir_index": 0, "seed": 5}]
    assert mix.shape == (4, 32000) and ys.shape == (2, 4, 32000)
    assert np.isfinite(mix).all()
    mix2, _, _ = ds[{"speech_index": 0, "rir_index": 0, "seed": 5}]
    np.testing.assert_array_equal(mix, mix2)
    # all overlap-spec modes parse
    for atl in ("mix 2", "all-mix 2", "frontend 2", "mid 2", "headtail 2",
                "min", "max", 2.0):
        ds.audio_time_len = atl
        m, y, p = ds[{"speech_index": 1, "rir_index": 0, "seed": 9}]
        assert np.isfinite(m).all(), atl

"""On-device mixture synthesis — the north-star on-device mixing path.

Device analogue of the SmsWsjPlus host pipeline (nbss_tpu/data/sms_wsj_plus.py,
mirroring /root/reference/data_loaders/sms_wsj_plus.py:119-251 and
utils/mix.py): the host supplies only RIR stacks (and, when a speech corpus
is mounted, dry sources); spatialization (FFT convolution with direct-path
alignment), overlap placement, SIR scaling, spatially-diffuse noise at a
target SNR, and peak normalization all run inside ONE jitted program keyed
by the per-item ``(index, seed)`` through ``jax.random.fold_in`` — the
deterministic-reproducibility backbone of the reference
(my_distributed_sampler.py:58-62) moved onto the chip.

Rationale: TPU hosts have few spare cores (this machine: one). The reference
spends ~1 s of host CPU per item in fftconvolve/STFT mixing across 10 worker
processes (sms_wsj_plus.py:272); here the same math is a few milliseconds of
VPU/FFT work batched over the training batch, so the input pipeline can never
starve the chip.

Semantics notes vs the host pipeline:
- The host path convolves each cropped source then truncates the reverb tail
  at the segment end before placement (mix.py:122-148 + :269-303). Here the
  dry source is masked to its segment *before* convolution, so the reverb
  tail extends (physically) past the segment boundary. Targets use the
  direct path (~tens of ms), so the difference is inaudible there.
- Randomness: everything (overlap type/ratio, shifts, SIR, SNR, noise) is
  drawn on device from fold_in(key, seed); the host RNG only picks which
  RIR file / which sources to read (file IO cannot move on device).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from pathlib import Path
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nbss_tpu.data.loader import DataModule
from nbss_tpu.io.stft import STFT

OVLP_SET = {
    "full": ("full",),
    "mid": ("mid",),
    "start": ("start",),
    "end": ("end",),
    "startend": ("start", "end"),
    "headtail": ("headtail",),
    "hms": ("headtail", "mid", "start", "end"),
    "fhms": ("full", "headtail", "mid", "start", "end"),
}
_TYPE_ID = {"full": 0, "mid": 1, "start": 2, "end": 3, "headtail": 4}


def fft_convolve(x: jnp.ndarray, h: jnp.ndarray, nfft: int) -> jnp.ndarray:
    """Linear convolution along the last axis via one shared rfft size.

    x [..., T], h [..., L] -> [..., nfft] (valid up to T+L-1; nfft >= T+L-1).
    """
    X = jnp.fft.rfft(x, n=nfft, axis=-1)
    H = jnp.fft.rfft(h, n=nfft, axis=-1)
    return jnp.fft.irfft(X * H, n=nfft, axis=-1)


def trajectory_windows(T: int, P: int, wintype: str = "trapezium20") -> np.ndarray:
    """Full-length crossfade windows W [P, T] for a P-point trajectory over a
    T-sample clip — the device analogue of the host scheme in
    mixing.convolve_trajectory_windowed (reference mix.py:197-244): window i
    is the 2*hop crossfade window centered at start i*hop, with hop chosen so
    the P windows tile [0, T] and adjacent ramps sum to 1 (hop forced even so
    the trapezium's zero-pads split symmetrically)."""
    from nbss_tpu.data.mixing import _crossfade_window

    assert P >= 2, P
    hop = -(-T // (P - 1))
    hop += hop % 2
    win = _crossfade_window(hop, wintype)  # [2*hop]
    W = np.zeros((P, T), np.float32)
    for i in range(P):
        lo = i * hop - hop
        src_lo, src_hi = max(0, -lo), min(2 * hop, T - lo)
        if src_hi > src_lo:
            W[i, lo + src_lo:lo + src_hi] = win[src_lo:src_hi]
    return W


def trajectory_convolve(dry: jnp.ndarray, rir: jnp.ndarray, W: jnp.ndarray,
                        nfft: int) -> jnp.ndarray:
    """Moving-source spatialization: sum_p conv(dry * W[p], rir[:, p]).

    dry [S, T], rir [S, P, C, L], W [P, T] -> [S, C, nfft]. Identical to the
    host convolve_trajectory_windowed up to the shared-nfft FFT size (tested
    against it in tests/test_device_mix.py)."""
    dry_w = dry[:, None, :] * W[None, :, :]           # [S, P, T]
    wet_p = fft_convolve(dry_w[:, :, None, :], rir, nfft)  # [S, P, C, nfft]
    return wet_p.sum(axis=1)


def synth_speech(key: jax.Array, T: int, fs: int) -> jnp.ndarray:
    """Speech-like source on device: formant-shaped noise with a syllabic
    envelope and pauses (device analogue of data/synthetic.py:_speechlike).

    Spectral shaping happens in the frequency domain (one rfft round trip):
    a 1/f tilt plus 3 random formant-ish resonances, which gives distinct
    per-speaker spectra — enough structure for separation training.
    """
    k_exc, k_formant, k_tilt, k_env, k_gate, k_f0 = jax.random.split(key, 6)
    x = jax.random.normal(k_exc, (T,), jnp.float32)

    F = T // 2 + 1
    f = jnp.arange(F, dtype=jnp.float32) * (fs / T)  # Hz per bin
    # spectral tilt: one-pole-ish low pass with random knee 300-800 Hz
    knee = 300.0 + 500.0 * jax.random.uniform(k_tilt)
    shape = 1.0 / jnp.sqrt(1.0 + (f / knee) ** 2)
    # 3 random "formants": gaussian bumps, 250-3200 Hz
    cf = jnp.exp(jax.random.uniform(k_formant, (3,), minval=jnp.log(250.0),
                                    maxval=jnp.log(min(3200.0, 0.45 * fs))))
    bw = 80.0 + 120.0 * jax.random.uniform(k_f0, (3,))
    bumps = jnp.exp(-0.5 * ((f[:, None] - cf[None, :]) / bw[None, :]) ** 2)
    shape = shape * (1.0 + 4.0 * bumps.sum(-1))
    X = jnp.fft.rfft(x) * shape
    y = jnp.fft.irfft(X, n=T)

    # syllabic-rate AM (3-5 Hz) + on/off gating at 0.5 s resolution
    t = jnp.arange(T, dtype=jnp.float32) / fs
    rate = 3.0 + 2.0 * jax.random.uniform(k_env)
    phase = jax.random.uniform(k_env, minval=0.0, maxval=6.28)
    env = (0.5 * (1.0 + jnp.sin(2.0 * jnp.pi * rate * t + phase))) ** 1.5
    blk = fs // 2
    nblk = -(-T // blk)
    gate = (jax.random.uniform(k_gate, (nblk,)) > 0.2).astype(jnp.float32)
    gate = gate.at[0].set(1.0)  # never fully silent
    gate = jnp.repeat(gate, blk)[:T]
    return y * env * gate


def _sample_overlap(key: jax.Array, types: Tuple[str, ...],
                    ratio_range: Tuple[float, float], T: int):
    """Device analogue of mix.py:34-104 for fixed-length clips: returns
    (lens [2] int32, shifts [2] int32) for two speakers."""
    k_type, k_ratio, k_which, k_shift = jax.random.split(key, 4)
    tid = jnp.asarray([_TYPE_ID[t] for t in types], jnp.int32)[
        jax.random.randint(k_type, (), 0, len(types))]
    ratio = jax.random.uniform(k_ratio, minval=ratio_range[0],
                               maxval=ratio_range[1])
    short = jnp.maximum((T * ratio).astype(jnp.int32), 1)
    ht_len = (T * (0.5 + ratio / 2.0)).astype(jnp.int32)
    which = jax.random.randint(k_which, (), 0, 2)  # which speaker is short
    shift_mid = jax.random.randint(k_shift, (), 0, jnp.maximum(T - short + 1, 1))

    def pick(full, mid, start, end, headtail):
        v = jnp.stack([full, mid, start, end, headtail])
        return v[tid]

    len_short = pick(T, short, short, short, ht_len)
    len_long = pick(T, T, T, T, ht_len)
    sh_short = pick(0, shift_mid, 0, T - len_short, T - ht_len)
    sh_long = jnp.where(tid == 4, 0, 0)
    lens = jnp.where(which == 0, jnp.stack([len_short, len_long]),
                     jnp.stack([len_long, len_short]))
    shifts = jnp.where(which == 0, jnp.stack([sh_short, sh_long]),
                       jnp.stack([sh_long, sh_short]))
    # headtail: speaker 0 at the head, speaker 1 at the tail (mix.py:225-226)
    shifts = jnp.where(tid == 4, jnp.stack([jnp.int32(0), T - ht_len]), shifts)
    lens = jnp.where(tid == 4, jnp.stack([ht_len, ht_len]), lens)
    return lens, shifts


def _diffuse_noise(key: jax.Array, C: int, T: int, cs_re: jnp.ndarray,
                   cs_im: jnp.ndarray, stft: STFT, babble_shape=None):
    """Spatially-diffuse noise [C, T]: independent channel noise mixed per
    frequency by conj(Cs) in the STFT domain (diffuse.py:48-67 on device)."""
    n = jax.random.normal(key, (C, T), jnp.float32)
    if babble_shape is not None:  # speech-spectrum-shaped excitation
        N_ = jnp.fft.rfft(n, axis=-1)
        f = jnp.arange(N_.shape[-1], dtype=jnp.float32)
        n = jnp.fft.irfft(N_ * babble_shape(f)[None, :], n=T, axis=-1)
    X, _ = stft.stft(n)  # [C, F, T']
    Cs = jax.lax.complex(cs_re, cs_im)  # [F, M, M]
    Y = jnp.einsum("fmn,mft->nft", jnp.conj(Cs), X)
    return stft.istft(Y, T)


@functools.partial(
    jax.jit,
    static_argnames=("T", "fs", "rir_len", "dp_len", "ovlp", "ratio_range",
                     "sir_range", "snr_range", "noise_types", "nfft"))
def mix_batch(
    key: jax.Array,
    seeds: jnp.ndarray,       # [B] int32 — per-item seeds from the sampler
    rir: jnp.ndarray,         # [B, S, C, rir_len] float32, or moving sources
                              #   (traj_win given): [B, S, P, C, rir_len]
    rir_dp: jnp.ndarray,      # [B, S, C, dp_len], moving: [B, S, P, C, dp_len]
    cs_re: jnp.ndarray,       # [F, C, C] diffuse mixing matrices (real part)
    cs_im: jnp.ndarray,
    dry: Optional[jnp.ndarray] = None,  # [B, S, T] or None -> synth on device
    traj_win: Optional[jnp.ndarray] = None,  # [P, T] trajectory crossfades
    *,
    T: int,
    fs: int,
    rir_len: int,
    dp_len: int,
    ovlp: str = "mid",
    ratio_range: Tuple[float, float] = (0.1, 1.0),
    sir_range: Optional[Tuple[float, float]] = (-5.0, 5.0),
    snr_range: Tuple[float, float] = (0.0, 20.0),
    noise_types: Tuple[str, ...] = ("babble", "white"),
    nfft: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (x [B, C, T], ys [B, S, C, T]); everything on device."""
    B, S, C = rir.shape[0], rir.shape[1], rir.shape[-2]
    if nfft == 0:
        nfft = 1 << (T + rir_len - 1).bit_length()
    types = OVLP_SET[ovlp]
    noise_stft = STFT(n_fft=2 * (cs_re.shape[0] - 1), n_hop=(cs_re.shape[0] - 1) // 2)

    def one(key_b, rir_b, dp_b, dry_b):
        ks = jax.random.split(key_b, 6)
        lens, shifts = _sample_overlap(ks[0], types, ratio_range, T)

        if dry_b is None:
            dry_sig = jnp.stack([synth_speech(jax.random.fold_in(ks[1], s), T, fs)
                                 for s in range(S)])
        else:
            dry_sig = dry_b
        idx = jnp.arange(T, dtype=jnp.int32)[None, :]
        seg = ((idx >= shifts[:, None]) & (idx < (shifts + lens)[:, None]))
        dry_sig = dry_sig * seg.astype(jnp.float32)

        if traj_win is not None:  # moving sources: [S, P, C, L] RIR stacks
            wet_full = trajectory_convolve(dry_sig, rir_b, traj_win, nfft)
            tgt_full = trajectory_convolve(dry_sig, dp_b, traj_win, nfft)
            # align by the FIRST trajectory point's ref-channel peak
            delay = jnp.argmax(rir_b[:, 0, 0, :], axis=-1)  # [S]
        else:
            wet_full = fft_convolve(dry_sig[:, None, :], rir_b, nfft)  # [S, C, nfft]
            tgt_full = fft_convolve(dry_sig[:, None, :], dp_b, nfft)
            # align by the reverberant RIR's ref-channel peak (mix.py:112-116)
            delay = jnp.argmax(rir_b[:, 0, :], axis=-1)  # [S]
        take = jax.vmap(
            lambda sig, d: jax.lax.dynamic_slice_in_dim(sig, d, T, axis=-1))
        wet = take(wet_full, delay)  # [S, C, T]
        tgt = take(tgt_full, delay)

        if sir_range is not None and S == 2:
            sir = jax.random.uniform(ks[2], minval=sir_range[0], maxval=sir_range[1])
            e0 = jnp.mean(wet[0] ** 2) + 1e-12
            e1 = jnp.mean(wet[1] ** 2) + 1e-12
            coeff = jnp.sqrt(e0 / e1 * 10.0 ** (-sir / 10.0))
            wet = wet.at[1].multiply(coeff)
            tgt = tgt.at[1].multiply(coeff)

        mix = wet.sum(axis=0)  # [C, T]
        nt = jax.random.randint(ks[3], (), 0, len(noise_types))
        shapes = []
        for name in noise_types:
            if name == "white":
                shapes.append(_diffuse_noise(ks[4], C, T, cs_re, cs_im, noise_stft))
            else:  # babble: speech-tilted spectrum
                shapes.append(_diffuse_noise(
                    ks[4], C, T, cs_re, cs_im, noise_stft,
                    babble_shape=lambda f: 1.0 / jnp.sqrt(1.0 + (f * (fs / T) / 500.0) ** 2)))
        noise = jnp.stack(shapes)[nt] if len(shapes) > 1 else shapes[0]

        snr = jax.random.uniform(ks[5], minval=snr_range[0], maxval=snr_range[1])
        em = jnp.mean(mix ** 2) + 1e-12
        en = jnp.mean(noise ** 2) + 1e-12
        noise = noise * jnp.sqrt(em / en * 10.0 ** (-snr / 10.0))
        mix = mix + noise

        scale = 0.9 / jnp.maximum(jnp.max(jnp.abs(mix)),
                                  jnp.maximum(jnp.max(jnp.abs(tgt)), 1e-9))
        return mix * scale, tgt * scale

    keys = jax.vmap(lambda s: jax.random.fold_in(key, s))(seeds)
    if dry is None:
        x, ys = jax.vmap(lambda k, r, d: one(k, r, d, None))(keys, rir, rir_dp)
    else:
        x, ys = jax.vmap(one)(keys, rir, rir_dp, dry)
    return x, ys


class DeviceMixLoader:
    """Wraps a host (rir, rir_dp, paras) batch loader; yields device-mixed
    (x, ys, paras) batches. Seeds ride in paras (the collate passes dicts
    through untouched, reference collate_func.py:8-16)."""

    def __init__(self, base_loader, mix_fn, base_key: jax.Array,
                 as_numpy: bool = False, paras_extra: Optional[Dict] = None):
        self.base = base_loader
        self.mix_fn = mix_fn
        self.key = base_key
        self.as_numpy = as_numpy  # test/predict consumers want host arrays
        self.paras_extra = paras_extra or {}

    def __len__(self):
        return len(self.base)

    def __iter__(self):
        for rir, rir_dp, paras in self.base:
            seeds = np.asarray([p["seed"] % (2 ** 31) for p in paras], np.int32)
            x, ys = self.mix_fn(self.key, jnp.asarray(seeds),
                                jnp.asarray(rir), jnp.asarray(rir_dp))
            if self.as_numpy:
                x, ys = np.asarray(x), np.asarray(ys)
            for p in paras:
                p.update(self.paras_extra)
            yield x, ys, paras


class DeviceRirDataset:
    """Host side of the device pipeline: per (index, seed) pick a room npz
    and source subset (file IO + selection only), return fixed-shape RIR
    stacks. All waveform math happens later, on device."""

    def __init__(self, rir_dir: str, subdir: str, num_spk: int, rir_len: int,
                 dp_len: int, num_items: int, shuffle_rir: bool,
                 traj_points: int = 0):
        self.rir_dir = Path(rir_dir).expanduser() / subdir
        self.rirs = sorted(str(r) for r in self.rir_dir.rglob("*.npz")
                           if not r.name.startswith("diffuse")
                           and "_rir_" not in r.name)
        assert self.rirs, f"{self.rir_dir} is empty or missing"
        self.num_spk = num_spk
        self.rir_len = rir_len
        self.dp_len = dp_len
        self.num_items = num_items
        self.shuffle_rir = shuffle_rir
        self.traj_points = traj_points
        self.index_mode = False  # see set_index_mode / preload
        self.room_meta = None

    def __len__(self):
        return self.num_items

    @staticmethod
    def _fit(a: np.ndarray, L: int) -> np.ndarray:
        if a.shape[-1] >= L:
            return a[..., :L]
        pad = [(0, 0)] * (a.ndim - 1) + [(0, L - a.shape[-1])]
        return np.pad(a, pad)

    def _room_n_src(self, path) -> int:
        """Source count of one room npz WITHOUT decompressing RIR data:
        trajectory rooms store a tiny filename list under 'rir'; static
        rooms get a header-only read of the stacked array's shape."""
        if self.traj_points:
            return len(np.load(path, allow_pickle=True)["rir"])
        import zipfile

        from numpy.lib import format as npf

        with zipfile.ZipFile(path) as zf:
            with zf.open("rir.npy") as f:
                version = npf.read_magic(f)
                if version == (1, 0):
                    shape, _, _ = npf.read_array_header_1_0(f)
                else:
                    shape, _, _ = npf.read_array_header_2_0(f)
        return shape[0]

    def set_index_mode(self, room_meta) -> None:
        """Yield (room_idx, spk_idx, paras) int items instead of RIR arrays
        — used with device-resident preloaded stacks (``preload``), so the
        hot loop never uploads waveform-sized arrays. The host RNG draws are
        kept call-for-call identical to the array mode, so the resulting
        mixtures are bit-identical either way."""
        assert len(room_meta) == len(self.rirs), (len(room_meta), len(self.rirs))
        self.index_mode = True
        self.room_meta = room_meta

    def preload(self, budget_bytes: int):
        """Load EVERY room once into rectangular stacks for device residency:
        returns {'rir': [R, S, (P,) C, rir_len], 'rir_dp': ..., 'meta': [...]}
        in the rooms' stored dtype (fp16 trajectory stacks stay fp16 — the
        gather path casts to fp32, matching the array path's load-time cast),
        or None when the corpus exceeds ``budget_bytes`` / rooms are ragged
        (different source counts) — callers then fall back to per-item IO.

        A header-only pre-pass rejects ragged corpora before any bulk
        array data is decompressed (a misconfigured corpus previously paid
        a full room-0 load before falling back)."""
        if len({self._room_n_src(p) for p in self.rirs}) > 1:
            return None  # ragged source counts: not stackable
        rirs, dps, metas = [], [], []
        for path in self.rirs:
            z = np.load(path, allow_pickle=True)
            if self.traj_points:
                names, dp_names = list(z["rir"]), list(z["rir_dp"])
                root = Path(path).parent
                srcs, srcs_dp = [], []
                for i in range(len(names)):
                    r = np.load(root / str(names[i]))  # [N, C, L] (fp16)
                    rdp = np.load(root / str(dp_names[i]),
                                  allow_pickle=True)["arr"]
                    sel = np.round(np.linspace(0, r.shape[0] - 1,
                                               self.traj_points)).astype(int)
                    dsel = np.round(np.linspace(0, rdp.shape[0] - 1,
                                                self.traj_points)).astype(int)
                    srcs.append(self._fit(r[sel], self.rir_len))
                    srcs_dp.append(self._fit(rdp[dsel], self.dp_len))
                rir, rir_dp = np.stack(srcs), np.stack(srcs_dp)
            else:
                rir = self._fit(np.asarray(z["rir"]), self.rir_len)
                rir_dp = self._fit(np.asarray(z["rir_dp"]), self.dp_len)
            if rirs and rir.shape != rirs[0].shape:
                return None  # ragged source counts: not stackable
            if not rirs and ((rir.nbytes + rir_dp.nbytes) * len(self.rirs)
                             > budget_bytes):
                return None
            rirs.append(rir)
            dps.append(rir_dp)
            metas.append({"n_src": rir.shape[0], "RT60": float(z["RT60"])})
        return {"rir": np.stack(rirs), "rir_dp": np.stack(dps), "meta": metas}

    def __getitem__(self, item):
        index, seed = item if isinstance(item, tuple) else (item, item)
        rng = np.random.default_rng(np.random.PCG64(seed))
        ri = (int(rng.integers(0, len(self.rirs)))
              if self.shuffle_rir else index % len(self.rirs))
        path = self.rirs[ri]
        if self.index_mode:
            n_src = self.room_meta[ri]["n_src"]
            spk_idx = rng.choice(n_src, size=self.num_spk,
                                 replace=False).astype(np.int32)
            paras = {"index": index, "seed": int(seed), "rir_file": path,
                     "RT60": self.room_meta[ri]["RT60"],
                     "saveto": [f"{index}_{s}.wav" for s in range(self.num_spk)]}
            return np.int32(ri), spk_idx, paras
        z = np.load(path, allow_pickle=True)
        if self.traj_points:  # trajectory rooms: per-source .npy RIR stacks
            names, dp_names = list(z["rir"]), list(z["rir_dp"])
            spk_idx = rng.choice(len(names), size=self.num_spk, replace=False)
            root = Path(path).parent
            rir, rir_dp = [], []
            for i in spk_idx:
                r = np.load(root / str(names[i])).astype(np.float32)  # [N, C, L]
                rdp = np.load(root / str(dp_names[i]),
                              allow_pickle=True)["arr"].astype(np.float32)
                sel = np.round(np.linspace(0, r.shape[0] - 1,
                                           self.traj_points)).astype(int)
                rir.append(r[sel])
                rir_dp.append(rdp[np.round(np.linspace(
                    0, rdp.shape[0] - 1, self.traj_points)).astype(int)])
            rir = self._fit(np.stack(rir), self.rir_len)
            rir_dp = self._fit(np.stack(rir_dp), self.dp_len)
        else:
            rir = np.asarray(z["rir"], np.float32)
            rir_dp = np.asarray(z["rir_dp"], np.float32)
            spk_idx = rng.choice(rir.shape[0], size=self.num_spk, replace=False)
            rir = self._fit(rir[spk_idx], self.rir_len)
            rir_dp = self._fit(rir_dp[spk_idx], self.dp_len)
        paras = {"index": index, "seed": int(seed), "rir_file": path,
                 "RT60": float(z["RT60"]),
                 "saveto": [f"{index}_{s}.wav" for s in range(self.num_spk)]}
        return rir, rir_dp, paras


@dataclass
class DeviceSyntheticDataModule(DataModule):
    """Flagship on-device pipeline: simulated-room RIR corpus (nbss_tpu.sim)
    + device-synthesized speech-like sources, mixed fully on device.

    CLI-compatible stand-in for SmsWsjPlusDataModule when no speech corpus is
    mounted; stage seeds/datasets mirror the reference ([None, 2, 3, 3],
    sms_wsj_plus.py:276)."""

    rir_dir: str = "~/rir_corpus"
    num_spk: int = 2
    sample_rate: int = 8000
    audio_time_len: Tuple[Optional[float], ...] = (4.0, 4.0, 4.0, 4.0)
    num_items: Tuple[int, ...] = (2000, 256, 256, 256)
    rir_len: int = 6144
    dp_len: int = 1024
    ovlp: str = "mid"
    speech_overlap_ratio: Tuple[float, float] = (0.1, 1.0)
    sir: Optional[Tuple[float, float]] = (-5.0, 5.0)
    snr: Tuple[float, float] = (0.0, 20.0)
    noise_type: Tuple[str, ...] = ("babble", "white")
    mix_key: int = 0
    trajectory_points: int = 0  # >0: moving sources (P-point RIR stacks)
    # None = auto: preload the whole RIR corpus into device HBM when it fits
    # NBSS_RIR_PRELOAD_MB (default 1024 MB); True forces it, False disables.
    preload_rir: Optional[bool] = None

    _cs_cache: Optional[Tuple[np.ndarray, np.ndarray]] = field(
        default=None, init=False, repr=False, compare=False)
    _preload_cache: Dict = field(default_factory=dict, init=False, repr=False,
                                 compare=False)

    def _subdir(self, stage_idx: int) -> str:
        return ("train", "validation", "test", "test")[stage_idx]

    def _make_dataset(self, stage_idx: int):
        ds = DeviceRirDataset(
            self.rir_dir, self._subdir(stage_idx), self.num_spk, self.rir_len,
            self.dp_len, self.num_items[stage_idx], shuffle_rir=stage_idx == 0,
            traj_points=self.trajectory_points)
        pre = self._preload_cache.get(self._subdir(stage_idx))
        if pre is not None:
            ds.set_index_mode(pre["meta"])
        return ds

    def _preloaded(self, stage_idx: int):
        """Device-resident RIR stacks for a stage, uploaded ONCE per process.

        With the stacks resident, the training hot loop uploads only int32
        (room, source) indices per step instead of ~20 MB of RIR arrays —
        the right layout for a single-core host anyway, and essential where
        host->device transfers are expensive or leak client-side staging
        (observed on the tunneled axon backend: every upload pinned its
        ~22 MB staging copy, OOM-killing a 2 h fit at 130 GB host RSS)."""
        import os

        sub = self._subdir(stage_idx)
        if sub in self._preload_cache:
            return self._preload_cache[sub]
        enabled = self.preload_rir
        if enabled is None:
            enabled = os.environ.get("NBSS_RIR_PRELOAD", "1") != "0"
        pre = None
        if enabled:
            ds = DeviceRirDataset(
                self.rir_dir, sub, self.num_spk, self.rir_len, self.dp_len,
                1, shuffle_rir=False, traj_points=self.trajectory_points)
            budget = (1 << 62 if self.preload_rir else
                      int(os.environ.get("NBSS_RIR_PRELOAD_MB", "1024")) << 20)
            raw = ds.preload(budget)
            if raw is not None:
                pre = {"rir": jnp.asarray(raw["rir"]),
                       "rir_dp": jnp.asarray(raw["rir_dp"]),
                       "meta": raw["meta"]}
        self._preload_cache[sub] = pre
        return pre

    def _cs(self) -> Tuple[np.ndarray, np.ndarray]:
        if self._cs_cache is None:
            from nbss_tpu.data.diffuse import spatial_coherence_mixing_matrices

            root = Path(self.rir_dir).expanduser()
            cache = root / "diffuse.npz"
            if cache.exists():
                Cs = np.load(cache, allow_pickle=True)["Cs"]
            else:
                first = sorted((root / "train").rglob("*.npz"))[0]
                pos = np.load(first, allow_pickle=True)["pos_rcv"]
                _, Cs = spatial_coherence_mixing_matrices(
                    pos_mics=np.asarray(pos, np.float64), fs=self.sample_rate,
                    noise_field="spherical", nfft=256)
                try:
                    np.savez(cache, Cs=Cs)
                except OSError:
                    pass
            self._cs_cache = (np.ascontiguousarray(Cs.real, dtype=np.float32),
                              np.ascontiguousarray(Cs.imag, dtype=np.float32))
        return self._cs_cache

    def _loader(self, stage_idx: int, epoch: int = 0, shuffle=None):
        pre = self._preloaded(stage_idx)  # before _make_dataset (index mode)
        base = super()._loader(stage_idx, epoch, shuffle)
        cs_re, cs_im = self._cs()
        T = int(self.audio_time_len[stage_idx] * self.sample_rate)
        fs = self.sample_rate
        mix = functools.partial(
            mix_batch,
            cs_re=jnp.asarray(cs_re), cs_im=jnp.asarray(cs_im),
            T=T, fs=fs, rir_len=self.rir_len, dp_len=self.dp_len,
            ovlp=self.ovlp, ratio_range=tuple(self.speech_overlap_ratio),
            sir_range=tuple(self.sir) if self.sir is not None else None,
            snr_range=tuple(self.snr), noise_types=tuple(self.noise_type))

        W = (jnp.asarray(trajectory_windows(T, self.trajectory_points))
             if self.trajectory_points else None)

        if pre is not None:
            stack_r, stack_dp = pre["rir"], pre["rir_dp"]

            def mix_fn(key, seeds, room, spk):
                # device gather from the resident stacks; the fp32 cast
                # mirrors the array path's load-time cast exactly
                r = stack_r[room[:, None], spk].astype(jnp.float32)
                rdp = stack_dp[room[:, None], spk].astype(jnp.float32)
                return mix(key, seeds, r, rdp, traj_win=W)
        else:
            def mix_fn(key, seeds, rir, rir_dp):
                return mix(key, seeds, rir, rir_dp, traj_win=W)

        # distinct key stream per stage so train/val/test never collide
        return DeviceMixLoader(
            base, mix_fn,
            jax.random.fold_in(jax.random.PRNGKey(self.mix_key), stage_idx),
            as_numpy=stage_idx >= 2,
            paras_extra={"sample_rate": self.sample_rate,
                         "dataset": f"DeviceSynth/{self._subdir(stage_idx)}"})

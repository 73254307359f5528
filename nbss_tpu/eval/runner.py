"""Test / predict drivers: metric collection, result JSON, example writing.

Counterpart of the reference test/predict flows (SURVEY.md §3.3-3.4):
per-item device metrics + host metrics (in a process pool, mirroring
general_steps.py:20-48's mp.Pool), per-item results_<ts>.json +
results_mean.json, first-N example wavs with a paras.json, and predict-time
wav writing honoring per-item ``saveto``.

Multi-host: each host evaluates its own data shard; result lists are merged
via jax allgather of per-item payloads when process_count > 1 (the analogue
of dist.all_gather_object, general_steps.py:75-91) — with dedup by wavname.
"""

from __future__ import annotations

import json
import os
import time
from multiprocessing import get_context
from typing import Dict, List, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from nbss_tpu.eval.metrics import cal_metrics


def _mean_of(results: List[Dict]) -> Dict:
    keys = {k for r in results for k, v in r.items() if isinstance(v, (int, float))}
    out = {}
    for k in sorted(keys):
        vals = [r[k] for r in results
                if isinstance(r.get(k), (int, float)) and np.isfinite(r[k])]
        if vals:
            out[k] = float(np.mean(vals))
    return out


def run_test(trainer, module, test_loader, log_dir: str,
             metrics: Sequence[str] = ("SDR", "SI_SDR"),
             write_examples: int = 200,
             mchunk=None,
             host_metric_workers: int = 4,
             length_bucket_s: float = 1.0,
             flush_every: int = 16) -> Dict:
    """length_bucket_s: full-length test utterances are zero-padded up to the
    next multiple of this many seconds before the jitted test step, so XLA
    compiles once per bucket instead of once per unique length (the
    reference's eager torch has no such constraint; test/predict use
    audio_time_len=None, sms_wsj_plus.py:276). Metrics are computed on the
    exact original lengths; the logged uPIT loss is over the padded signals
    (zero tails on predictions and targets alike).

    Results are written INCREMENTALLY: each item's device-metric result is
    appended to ``results_incremental.jsonl`` as soon as it exists, and
    ``results_mean.json`` is rewritten (with ``"partial": true``) every
    ``flush_every`` items — an interrupted eval always leaves a parseable
    partial artifact instead of an examples-only directory. Host metrics
    (PESQ/STOI, reference general_steps.py:36-41) run concurrently with the
    device loop in a spawn pool and are merged into the final files."""
    os.makedirs(log_dir, exist_ok=True)
    examples_dir = os.path.join(log_dir, "examples")
    results: List[Dict] = []
    host_async = []  # per-item AsyncResult (or None when the pool is down)

    import jax

    test_step = jax.jit(module.test_step)

    rank_tag = (f"_rank{jax.process_index()}" if jax.process_count() > 1
                else "")
    inc_path = os.path.join(log_dir, f"results_incremental{rank_tag}.jsonl")
    inc_f = open(inc_path, "w")
    mean_path = os.path.join(log_dir, f"results_mean{rank_tag}.json")

    def _flush_mean(partial: bool) -> Dict:
        mean = _mean_of(results)
        rec = ({"partial": True, "num_items": len(results), **mean}
               if partial else mean)
        tmp = mean_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(rec, f, indent=1)
        os.replace(tmp, mean_path)
        return mean

    # host metrics overlap the device loop (reference runs them after the
    # epoch in an mp.Pool; here the pool chews items while the TPU evals)
    try:
        pool = get_context("spawn").Pool(host_metric_workers)
    except Exception:
        pool = None

    seen = set()
    item_idx = 0
    for batch_idx, (x, ys, paras) in enumerate(test_loader):
        T0 = x.shape[-1]
        fs_b = paras[0].get("sample_rate", 16000) if paras else 16000
        x = _pad_to_bucket(x, T0, length_bucket_s, fs_b)
        ys = _pad_to_bucket(ys, T0, length_bucket_s, fs_b)
        out = test_step(trainer.params, (jnp.asarray(x), jnp.asarray(ys)))
        batch_loss = float(out["loss"])  # batch-mean (per-item not separable)
        yr_hat_b = np.asarray(out["yr_hat"])[..., :T0]
        yr_b = np.asarray(out["yr"])[..., :T0]
        x_ref_b = np.asarray(out["x_ref"])[..., :T0]
        for b in range(yr_hat_b.shape[0]):
            para = paras[b] if b < len(paras) else {}
            wavname = os.path.basename(
                f"{para.get('wavname', para.get('index', item_idx))}")
            if wavname in seen:  # dedup padded duplicates from rank striding
                continue
            seen.add(wavname)
            yr_hat, yr, x_ref = yr_hat_b[b], yr_b[b], x_ref_b[b]
            fs = para.get("sample_rate", 16000)

            result = {"id": item_idx, "wavname": wavname,
                      module.loss.name: batch_loss}
            m, im, imp = cal_metrics(metrics, yr_hat, yr,
                                     np.broadcast_to(x_ref, yr.shape),
                                     fs, device_only="device", chunk=mchunk)
            result.update(im)
            result.update(imp)
            result.update(m)
            hi = (metrics, yr_hat, yr,
                  np.broadcast_to(x_ref, yr.shape).copy(), fs, "host", mchunk)
            host_async.append(pool.apply_async(cal_metrics, hi)
                              if pool is not None else hi)

            if write_examples < 0 or item_idx < write_examples:
                _write_example(examples_dir, wavname, x_ref, yr, yr_hat, fs,
                               para, result)

            result["paras"] = _jsonable(para)
            results.append(result)
            inc_f.write(json.dumps(result, default=str) + "\n")
            inc_f.flush()
            item_idx += 1
            if item_idx % flush_every == 0:
                _flush_mean(partial=True)

    # collect host metrics (already computed concurrently when pooled)
    for r, h in zip(results, host_async):
        try:
            m, im, imp = h.get() if pool is not None else cal_metrics(*h)
        except Exception:
            continue  # per-item degrade-to-None (reference metrics.py:142-149)
        merged = {**im, **imp, **m}
        r.update({k: v for k, v in merged.items() if v is not None})
    if pool is not None:
        pool.close()
        pool.join()
    inc_f.close()

    # multi-host: each process writes its shard; rank 0 merges after a
    # barrier (the all_gather_object analogue, general_steps.py:75-91, over
    # a shared filesystem)
    ts = time.strftime("%Y%m%d_%H%M%S")
    if jax.process_count() > 1:
        shard_path = os.path.join(log_dir, f"results_rank{jax.process_index()}.json")
        with open(shard_path, "w") as f:
            json.dump(results, f, indent=1, default=str)
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("nbss_tpu_test_results")
        if jax.process_index() != 0:
            return {"num_items": len(results)}
        merged, seen_names = [], set()
        for r in range(jax.process_count()):
            p = os.path.join(log_dir, f"results_rank{r}.json")
            if os.path.exists(p):
                for item in json.load(open(p)):
                    if item["wavname"] not in seen_names:
                        seen_names.add(item["wavname"])
                        merged.append(item)
        results = merged

    with open(os.path.join(log_dir, f"results_{ts}.json"), "w") as f:
        json.dump(results, f, indent=1, default=str)
    mean = _mean_of(results)
    with open(os.path.join(log_dir, "results_mean.json"), "w") as f:
        json.dump(mean, f, indent=1)
    return {"num_items": len(results), **mean}


def _pad_to_bucket(x, T0: int, length_bucket_s: float, fs: int):
    """Zero-pad the last dim up to the next length bucket (falsy
    ``length_bucket_s`` disables padding). Shared by run_test/run_predict."""
    if not length_bucket_s:
        return x
    quantum = max(int(length_bucket_s * fs), 1)
    Tpad = -(-T0 // quantum) * quantum
    if Tpad == T0:
        return x
    return np.pad(np.asarray(x), [(0, 0)] * (np.ndim(x) - 1) + [(0, Tpad - T0)])


def run_predict(trainer, module, predict_loader, log_dir: str,
                length_bucket_s: float = 1.0) -> List[str]:
    """Write predicted wavs to log_dir/examples honoring paras['saveto']
    (reference general_steps.py:110-160). ``length_bucket_s`` behaves as in
    run_test (falsy disables padding)."""
    from nbss_tpu.utils.audio_io import write_audio
    import jax

    out_dir = os.path.join(log_dir, "examples")
    os.makedirs(out_dir, exist_ok=True)
    predict = jax.jit(lambda p, x: module.predict_step(p, x))
    written = []
    for batch_idx, (x, ys, paras) in enumerate(predict_loader):
        # length-bucket padding to bound recompiles (see run_test)
        T0 = x.shape[-1]
        fs_b = paras[0].get("sample_rate", 16000) if paras else 16000
        x = _pad_to_bucket(x, T0, length_bucket_s, fs_b)
        yhat = np.asarray(predict(trainer.params, jnp.asarray(x)))[..., :T0]
        for b, para in enumerate(paras):
            fs = para.get("sample_rate", 16000)
            saveto = para.get("saveto") or [f"{para.get('index', batch_idx)}_{s}.wav"
                                            for s in range(yhat.shape[1])]
            if isinstance(saveto, str):
                saveto = [saveto]
            if isinstance(saveto, dict):
                saveto = saveto.get("prediction", list(saveto.values())[0])
            for s, name in enumerate(saveto[: yhat.shape[1]]):
                path = os.path.join(out_dir, name)
                os.makedirs(os.path.dirname(path), exist_ok=True)
                write_audio(path, yhat[b, s], fs)
                written.append(path)
    return written


def _write_example(examples_dir, wavname, x_ref, yr, yr_hat, fs, para, result):
    from nbss_tpu.utils.audio_io import write_audio

    d = os.path.join(examples_dir, os.path.splitext(wavname)[0])
    os.makedirs(d, exist_ok=True)
    write_audio(os.path.join(d, "mixture.wav"), x_ref, fs)
    for s in range(yr.shape[0]):
        write_audio(os.path.join(d, f"target_{s}.wav"), yr[s], fs)
        write_audio(os.path.join(d, f"prediction_{s}.wav"), yr_hat[s], fs)
    with open(os.path.join(d, "paras.json"), "w") as f:
        json.dump({"paras": _jsonable(para), "result": _jsonable(result)}, f,
                  indent=1, default=str)


def _jsonable(obj):
    if isinstance(obj, dict):
        return {k: _jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_jsonable(v) for v in obj]
    if isinstance(obj, np.ndarray):
        return f"<array shape={obj.shape}>"
    if isinstance(obj, (np.floating, np.integer)):
        return obj.item()
    return obj

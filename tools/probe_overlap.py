"""Measure upload / device-chain / download overlap on the axon backend.

The encode pipeline's theoretical sustained rate is max(stage) if transfers
overlap device compute (and each other), but sum(stages) if the tunnel
serializes them.  This probe isolates each stage with fresh inputs (the
backend elides repeated identical executions) and then times two pipelined
formulations — the shipped one and a threaded-upload prototype — to find
where the overlap is lost.

Run alone (one TPU process at a time):  python tools/probe_overlap.py
"""
from __future__ import annotations

import os
import queue
import sys
import threading
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")

import jax  # noqa: E402

jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import make_photo  # noqa: E402
from llcomp_tpu import encode as jenc  # noqa: E402
from llcomp_tpu.core.config import REV2  # noqa: E402

H = W = int(os.environ.get("PROBE_SIZE", "512"))
CH = 3
SLICE_H = 8
N_IMAGES = int(os.environ.get("PROBE_IMAGES", "16"))
NB = int(os.environ.get("PROBE_BATCHES", "4"))
MP = N_IMAGES * H * W / 1e6
N_SYM = SLICE_H * W * CH


def fresh(tag: int) -> np.ndarray:
    return np.concatenate(
        [make_photo(H, W, c=CH, seed=31337 + tag * 131 + i).reshape(
            H // SLICE_H, SLICE_H, W, CH) for i in range(N_IMAGES)]
    )


def run_chain(imgs_np, imgs_g):
    hg, dg, counts = jenc._stage_precompute_g(imgs_g, SLICE_H, W, CH, REV2)
    kp_g, kp_fin, lens, _ = jenc._launch_stage_rest(
        (imgs_np, hg, dg, counts, REV2), jenc._outcap(N_SYM),
        speculate=False, primed=True,
    )
    return kp_g, kp_fin, lens


def main() -> None:
    tag = [0]

    def batchset():
        out = [fresh(tag[0] + i) for i in range(NB)]
        tag[0] += NB
        return out

    print("warm compile ...", flush=True)
    t0 = time.time()
    jenc.encode_lanes(fresh(9999), engine="pallas", primed=True)
    print(f"  compile+first run {time.time() - t0:.1f}s", flush=True)

    # (a) host grouping
    bs = batchset()
    t0 = time.time()
    gs = [jenc._group_host(b) for b in bs]
    t_group = (time.time() - t0) / NB
    print(f"a) host group:        {t_group:.3f} s/batch", flush=True)

    # (b) upload only
    t0 = time.time()
    ups = [jax.device_put(g) for g in gs]
    t_disp = (time.time() - t0) / NB
    for u in ups:
        u.block_until_ready()
    t_upload = (time.time() - t0) / NB
    print(f"b) upload:            {t_upload:.3f} s/batch "
          f"(dispatch returned after {t_disp:.3f})", flush=True)

    # (c) device chain only (incl. the lens sync + expansion), inputs resident
    t0 = time.time()
    res = [run_chain(b, u) for b, u in zip(bs, ups)]
    done = [jenc._collect_bytes(kp, kf, ln, jenc._outcap(N_SYM))
            for kp, kf, ln in res]
    for b2, _ in done:
        b2.block_until_ready()
    t_chain = (time.time() - t0) / NB
    print(f"c) device chain only: {t_chain:.3f} s/batch "
          f"= {MP / t_chain:.2f} MP/s", flush=True)

    # (d) device chain + download, fresh inputs already resident
    bs = batchset()
    ups = [jax.device_put(jenc._group_host(b)) for b in bs]
    for u in ups:
        u.block_until_ready()
    t0 = time.time()
    res = [run_chain(b, u) for b, u in zip(bs, ups)]
    done = [jenc._collect_bytes(kp, kf, ln, jenc._outcap(N_SYM))
            for kp, kf, ln in res]
    outs = [np.asarray(b2) for b2, _ in done]
    t_cd = (time.time() - t0) / NB
    print(f"d) chain + download:  {t_cd:.3f} s/batch = {MP / t_cd:.2f} MP/s",
          flush=True)

    # (e) shipped pipelined path end-to-end
    bs = batchset()
    t0 = time.time()
    jenc.encode_lanes_pipelined(bs, primed=True)
    t_pipe = (time.time() - t0) / NB
    print(f"e) shipped pipelined: {t_pipe:.3f} s/batch = {MP / t_pipe:.2f} MP/s",
          flush=True)

    # (f) threaded uploads: group+device_put on a worker thread while the
    #     main thread dispatches chains and collects results
    bs = batchset()
    q: queue.Queue = queue.Queue(maxsize=2)

    def uploader():
        for b in bs:
            u = jax.device_put(jenc._group_host(b))
            q.put((b, u))

    t0 = time.time()
    th = threading.Thread(target=uploader)
    th.start()
    inflight = []
    for _ in range(NB):
        b, u = q.get()
        inflight.append(run_chain(b, u))
    done = [jenc._collect_bytes(kp, kf, ln, jenc._outcap(N_SYM))
            for kp, kf, ln in inflight]
    outs = [np.asarray(b2) for b2, _ in done]
    th.join()
    t_thr = (time.time() - t0) / NB
    print(f"f) threaded uploads:  {t_thr:.3f} s/batch = {MP / t_thr:.2f} MP/s",
          flush=True)

    # (g) like f, but ALSO drain downloads on a second worker so the
    #     device->host copies start as soon as each batch's lens land
    bs = batchset()
    q2: queue.Queue = queue.Queue(maxsize=2)

    def uploader2():
        for b in bs:
            u = jax.device_put(jenc._group_host(b))
            q2.put((b, u))

    outq: queue.Queue = queue.Queue()

    def collector():
        got = []
        for _ in range(NB):
            kp, kf, ln = outq.get()
            got.append(jenc._collect_bytes(kp, kf, ln, jenc._outcap(N_SYM)))
        return [np.asarray(b2) for b2, _ in got]

    t0 = time.time()
    th = threading.Thread(target=uploader2)
    th.start()
    col: list = []
    tc = threading.Thread(target=lambda: col.append(collector()))
    tc.start()
    for _ in range(NB):
        b, u = q2.get()
        outq.put(run_chain(b, u))
    tc.join()
    th.join()
    t_full = (time.time() - t0) / NB
    print(f"g) threaded up+down:  {t_full:.3f} s/batch = {MP / t_full:.2f} MP/s",
          flush=True)


if __name__ == "__main__":
    main()

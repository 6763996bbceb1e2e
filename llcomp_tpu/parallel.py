"""Device-mesh parallel encode/decode (pjit over a 1-D lane mesh).

The codec's unit of parallelism is the independent stream (SURVEY §7): every
stage of the pipeline — precompute, decision scan, slot emission, symbol
scan — is a pure map over the lane axis, so sharding the batch over a
``jax.sharding.Mesh`` partitions the whole program with **zero collectives**:
each device runs its lanes' scans locally; only the host-side gather of
variable-length byte streams touches the results, and that is an ordered
concatenation by slice index (the container records per-slice lengths).

Multi-host: each process feeds its local lanes
(`jax.make_array_from_process_local_data`), runs the same jit, and
contributes its streams to the container in slice order — the constant
tables are jit constants, broadcast once at compile time.

Scaling model (vs the reference's single thread, `llcomp.hpp:390-448`):
throughput = lanes_in_flight / lockstep_step_time, so efficiency stays ~1.0
as long as every device has enough lanes to fill — which is why
``pick_slice_height`` targets many more stripes than devices.
"""
from __future__ import annotations

import functools
import os

import numpy as np

import jax

from . import _env  # noqa: F401  (axon env repair: persistent cache)
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from . import coder, container
from . import decode as jdecode
from . import encode as jencode
from .core import tables, transform
from .core.config import REV2, CodecConfig

LANE_AXIS = "lanes"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (LANE_AXIS,))


def _pad_lanes(n: int, n_dev: int) -> int:
    return -(-n // n_dev) * n_dev


@functools.lru_cache(maxsize=64)
def _fused_shard_fn(mesh: Mesh, sh: int, W: int, C: int, NSUB: int,
                    mcap: int, cfg: CodecConfig, restart: bool):
    """Cached jitted shard_map for the fused pod path: rebuilding the
    closure per call forced a retrace every encode (measured 1.9x e2e
    loss at the bench geometry on one chip).  The prior operands are
    explicit replicated args so seeded tables don't key the cache."""
    from .pallas import encode_fused as ef

    n_sym = sh * W * C

    def _shard(x, plo, phi):
        g = jencode._regroup_device_nsub(x, NSUB)
        hg, dg, _ = jencode._stage_precompute_g(g, sh, W, C, cfg)
        xs = jencode._stage_xs_fused(hg, dg, n_sym)
        return ef._encode_fused_groups(xs, plo, phi, mcap, cfg, restart)

    return jax.jit(
        jax.shard_map(
            _shard, mesh=mesh,
            in_specs=(P(LANE_AXIS), P(), P()),
            out_specs=(P(LANE_AXIS), P(LANE_AXIS), P(LANE_AXIS)),
            check_vma=False,
        )
    )


@functools.lru_cache(maxsize=64)
def _expand_shard_fn(mesh: Mesh, cap2: int):
    return jax.jit(
        jax.shard_map(
            lambda m: coder.expand_markers(m, cap2), mesh=mesh,
            in_specs=P(LANE_AXIS), out_specs=P(LANE_AXIS),
        )
    )


def _encode_lanes_sharded_fused(
    lanes: np.ndarray, mesh: Mesh, cfg: CodecConfig, primed: bool, seed,
) -> list[bytes]:
    """Fused-engine sharded encode: each device runs the fused Pallas
    kernel (model + range coder in VMEM, pallas/encode_fused.py) on its
    own whole lane groups — shard_map over the pallas_call, zero
    collectives, byte-identical to the single-device fused engine.

    This is the production pod path (VERDICT r04 #3): the XLA-scan
    shard_map below is ~2-3x slower per device on TPU hardware, so a pod
    of chips each running the scan would scale the wrong number.  CPU
    meshes run this through Pallas interpret mode (tests) but default to
    the scan, which is faster off-chip.

    Raises ``encode.FusedOverflow`` (near-incompressible lanes); the
    caller falls back to the scan path, which has no marker cap and
    produces identical bytes.
    """
    from .pallas import encode_fused as ef

    S = lanes.shape[0]
    sh, W, C = lanes.shape[1], lanes.shape[2], lanes.shape[3]
    n_sym = sh * W * C
    n_dev = mesh.devices.size
    # every device must hold a whole number of NSUB*128-lane kernel groups
    NSUB, mcap = ef.pick_geometry(n_sym, max(1, -(-S // (128 * n_dev))))
    block = NSUB * 128 * n_dev
    Sp = -(-S // block) * block
    if Sp != S:  # pad with copies of lane 0; padded outputs are dropped
        lanes = np.concatenate([lanes, np.repeat(lanes[:1], Sp - S, axis=0)])
    flat = jencode._flat_host(np.ascontiguousarray(lanes, dtype=np.uint8))
    dev = jax.device_put(flat, NamedSharding(mesh, P(LANE_AXIS)))
    restart = primed or seed is not None

    plo, phi = ef._prior_operands(seed)
    fn = _fused_shard_fn(mesh, sh, W, C, NSUB, mcap, cfg, restart)
    mk, lens, ovf = fn(dev, plo, phi)
    lens_np, ovf_np = jax.device_get((lens, ovf))
    if int(np.asarray(ovf_np).max(initial=0)):
        raise jencode.FusedOverflow("marker overflow on the sharded path")
    lens_np = np.asarray(lens_np).reshape(-1)
    outcap = jencode._outcap(n_sym)
    maxlen = int(lens_np.max(initial=1))
    # same geometric cap ladder as the single-device path: the expansion
    # compiles once per cap value, nearby batch maxima share a bucket
    cap2 = 1024
    while cap2 < maxlen:
        cap2 = min(outcap, -(-(cap2 + cap2 // 2) // 1024) * 1024)
    cap2 = min(outcap, cap2)
    if mk.shape[2] > cap2:  # marker row i has off >= i (encode._fused_collect)
        mk = mk[:, :, :cap2, :]
    byts_d = _expand_shard_fn(mesh, cap2)(mk)
    byts_d.copy_to_host_async()
    byts = np.asarray(byts_d)
    byts = byts.transpose(0, 1, 3, 2).reshape(-1, cap2)
    return [byts[s, : lens_np[s]].tobytes() for s in range(S)]


def encode_lanes_sharded(
    lanes: np.ndarray, mesh: Mesh, cfg: CodecConfig = REV2,
    primed: bool = False, seed=None, engine: str = "auto",
) -> list[bytes]:
    """Encode equal-shaped lanes [S, H, W, C], sharded over the mesh lane
    axis.  ``seed``: optional [121, 8] stored-seed table (flag bit 1) —
    replicated to every device as a jit constant, like the static prior.

    ``engine``: "auto" dispatches the fused Pallas kernel per device on
    TPU meshes (the production pod path) and the XLA scan on CPU meshes;
    "fused"/"xla" force one (the fused engine off-chip runs in Pallas
    interpret mode — slow, test-only)."""
    n_sym = int(np.prod(lanes.shape[1:]))
    if engine != "xla":
        from .pallas import encode_fused as ef

        platform = next(iter(mesh.devices.flat)).platform
        want = engine == "fused" or (
            engine == "auto" and platform == "tpu"
            and os.environ.get("LLCT_ENCODE_ENGINE", "fused") == "fused")
        if want and ef.fits_fused(n_sym, tuned=False):
            try:
                return _encode_lanes_sharded_fused(
                    lanes, mesh, cfg, primed, seed)
            except jencode.FusedOverflow:
                pass  # scan path below: no marker cap, identical bytes
    S = lanes.shape[0]
    n_dev = mesh.devices.size
    Sp = _pad_lanes(S, n_dev)
    if Sp != S:  # pad with copies of lane 0; padded outputs are dropped
        lanes = np.concatenate([lanes, np.repeat(lanes[:1], Sp - S, axis=0)])

    sh_in = NamedSharding(mesh, P(LANE_AXIS))
    dev_lanes = jax.device_put(np.ascontiguousarray(lanes, dtype=np.uint8), sh_in)

    counts = np.asarray(jencode._count(dev_lanes, cfg))
    cap = jencode._bucket(int(counts.max()))
    rstmap = (None if seed is None else
              np.asarray(tables.prior_full_from(seed, cfg.num_states,
                                                cfg.substates)))

    fn = _scan_shard_fn(mesh, cap, cfg, primed, rstmap is not None)
    meta, runs = fn(dev_lanes, np.zeros(1, np.int32) if rstmap is None
                    else rstmap)
    return coder.expand_slots_batch(np.asarray(meta), np.asarray(runs))[:S]


@functools.lru_cache(maxsize=64)
def _scan_shard_fn(mesh: Mesh, cap: int, cfg: CodecConfig, primed: bool,
                   has_rst: bool):
    """Cached jitted shard_map for the XLA-scan path: every device runs
    the full scan on its own lane block with purely local flat indexing —
    zero collectives by construction (the SPMD partitioner cannot prove
    locality of the flat model gathers itself)."""

    def _shard(x, rst):
        return jencode._pipeline_impl(x, cap, cfg, primed,
                                      rst if has_rst else None)

    return jax.jit(
        jax.shard_map(
            _shard, mesh=mesh,
            in_specs=(P(LANE_AXIS), P()),
            out_specs=(P(None, LANE_AXIS), P(None, LANE_AXIS)),
            check_vma=False,  # constant-seeded scan carries vary over lanes
        )
    )


@functools.lru_cache(maxsize=64)
def _decode_shard_fn(mesh: Mesh, H: int, W: int, C: int, cfg: CodecConfig,
                     primed: bool, has_rst: bool):
    def _shard(x, rst):
        return jdecode._decode_impl(x, H, W, C, cfg, primed,
                                    rst if has_rst else None)

    return jax.jit(
        jax.shard_map(
            _shard, mesh=mesh,
            in_specs=(P(LANE_AXIS), P()),
            out_specs=(P(LANE_AXIS), P(LANE_AXIS)),
            check_vma=False,  # constant-seeded scan carries vary over lanes
        )
    )


def decode_lanes_sharded(
    streams: list[bytes], shape: tuple[int, int, int], mesh: Mesh,
    cfg: CodecConfig = REV2, primed: bool = False, seed=None,
) -> np.ndarray:
    H, W, C = shape
    S = len(streams)
    n_dev = mesh.devices.size
    Sp = _pad_lanes(S, n_dev)
    cap = jdecode._bucket_cap(max((len(s) for s in streams), default=0))
    data = np.zeros((Sp, cap), dtype=np.uint8)
    for s, blob in enumerate(streams):
        data[s, : len(blob)] = np.frombuffer(blob, dtype=np.uint8)

    sh_in = NamedSharding(mesh, P(LANE_AXIS))
    dev = jax.device_put(data, sh_in)
    rstmap = (None if seed is None else
              np.asarray(tables.prior_full_from(seed, cfg.num_states,
                                                cfg.substates)))
    fn = _decode_shard_fn(mesh, H, W, C, cfg, primed, rstmap is not None)
    planes, err = fn(dev, np.zeros(1, np.int32) if rstmap is None
                     else rstmap)
    err = np.asarray(err)[:S]
    if err.any():
        raise ValueError(
            f"corrupt stream in lanes {np.nonzero(err)[0].tolist()}"
        )
    return np.asarray(transform.rct_inverse(planes[:S]))


def compress_sharded(
    img: np.ndarray, mesh: Mesh, slices: int | str = "auto", cfg: CodecConfig = REV2
) -> bytes:
    """Sliced-container compress with stripes sharded over the mesh.

    Mirrors ``api.compress`` policy: ultra-wide VMEM-clamped images are
    column-tiled (flag bit 3, ``api.pick_tiling``) so every device's
    fused kernel runs at full sublane packing — a pod host and a
    single-chip host shape identical containers for the same geometry
    when both use the auto policies (tiling is geometry-pure; the
    mesh-targeted stripe count below only applies untiled).
    """
    from . import api

    img = api._as_image(img)
    H, W, C = img.shape
    tile_w = 0
    if slices == "auto":
        tile_w, slice_h = api.pick_tiling(H, W, C)
        if not tile_w:
            slice_h = api.pick_slice_height(
                H, W, C, target_lanes=8 * mesh.devices.size)
    else:
        slice_h = max(1, -(-H // int(slices)))
    regions = container.tile_regions(W, H, slice_h, tile_w)
    primed = len(regions) > 1 and api._pick_primed(img, cfg)
    seed_tab = seed_blob = None
    if primed and H * W * C >= 120_000:  # same auto policy as api.compress
        from . import seed as seedmod

        seed_tab = seedmod.derive(img, cfg)
        seed_blob = seedmod.pack_blob(seed_tab)

    by_shape: dict[tuple[int, int], list[int]] = {}
    for i, (y0, y1, x0, x1) in enumerate(regions):
        by_shape.setdefault((y1 - y0, x1 - x0), []).append(i)
    out: list[bytes] = [b""] * len(regions)
    for (rows, cols), idxs in by_shape.items():
        stack = np.stack([img[regions[i][0] : regions[i][1],
                              regions[i][2] : regions[i][3]] for i in idxs])
        for i, blob in zip(
            idxs, encode_lanes_sharded(stack, mesh, cfg, primed, seed_tab)
        ):
            out[i] = blob
    return container.pack_sliced(
        out, W, H, C, slice_h, cfg,
        flags=(container.FLAG_SEEDED if seed_tab is not None
               else (container.FLAG_PRIMED if primed else 0))
        | container.FLAG_CRC,
        seed_blob=seed_blob, tile_w=tile_w,
    )


def decompress_sharded(data: bytes, mesh: Mesh, cfg: CodecConfig = REV2) -> np.ndarray:
    (streams, W, H, C, slice_h, flags, seed_blob,
     tile_w) = container.unpack_sliced(data, cfg)
    seed_tab = None
    if seed_blob is not None:
        from . import seed as seedmod

        seed_tab = seedmod.unpack_blob(seed_blob)
    primed = bool(flags & (container.FLAG_PRIMED | container.FLAG_SEEDED))
    regions = container.tile_regions(W, H, slice_h, tile_w)
    out = np.empty((H, W, C), dtype=np.uint8)
    by_shape: dict[tuple[int, int], list[int]] = {}
    for i, (y0, y1, x0, x1) in enumerate(regions):
        by_shape.setdefault((y1 - y0, x1 - x0), []).append(i)
    for (rows, cols), idxs in by_shape.items():
        lanes = decode_lanes_sharded(
            [streams[i] for i in idxs], (rows, cols, C), mesh, cfg, primed,
            seed_tab,
        )
        for k, i in enumerate(idxs):
            y0, y1, x0, x1 = regions[i]
            out[y0:y1, x0:x1] = lanes[k]
    return out

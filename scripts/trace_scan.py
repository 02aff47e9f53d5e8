"""Trace a short denoise_sequence scan and attribute device time per
stage scope + list top unattributed ops — finds scan-mode overheads."""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

#: default 60 — the full reference workload (opencl/bmfr.cpp:41), so the
#: per-stage table amortizes the teleport fallback exactly like the
#: headline bench and must total within 5% of it (VERDICT r3 #6)
FRAMES = int(os.environ.get("TRACE_FRAMES", "60"))


def main():
    from bmfr_tpu import xplane
    from bmfr_tpu.config import BMFRConfig
    from bmfr_tpu.io.fixtures import synthetic_sequence
    from bmfr_tpu.pipeline.denoise import FrameInputs, denoise_sequence
    from bmfr_tpu.profiling import force, trace

    H, W = 720, 1280
    mode = os.environ.get("WARP_MODE", "pallas")
    fitter = os.environ.get("FITTER", "pallas_direct")
    solver = os.environ.get("SOLVER", "cholesky")
    tier = os.environ.get("TIER", "steady_cond")
    residual = os.environ.get("RESIDUAL", "bfloat16")
    cfg = BMFRConfig(image_width=W, image_height=H,
                     position_limit_squared=0.03,
                     normal_limit_squared=0.5,
                     warp_mode=mode, fitter_impl=fitter,
                     solver=solver, warp_tier_impl=tier,
                     residual_dtype=residual).validate()
    sc = synthetic_sequence(width=W, height=H, frames=FRAMES)
    to_tchw = lambda a: jnp.asarray(np.moveaxis(a, -1, 1).astype(np.float32))
    inputs = FrameInputs(
        normals=to_tchw(sc["normals"]), positions=to_tchw(sc["positions"]),
        noisy=to_tchw(sc["noisy"]), albedo=to_tchw(sc["albedo"]))
    cams = jnp.asarray(sc["camera_matrices"])
    offs = jnp.asarray(sc["pixel_offsets"])

    jfn = jax.jit(lambda i, c, o: denoise_sequence(cfg, i, c, o))
    compiled = jfn.lower(inputs, cams, offs).compile()
    force(jfn(inputs, cams, offs))
    logdir = "/tmp/scan_trace"
    shutil.rmtree(logdir, ignore_errors=True)
    with trace(logdir):
        force(jfn(inputs, cams, offs))

    hlo = compiled.as_text()
    per, other, total = xplane.stage_device_times(logdir, hlo_text=hlo)
    busy, span = xplane.device_busy_span(logdir)
    print(f"scan of {FRAMES} frames, warp_mode={mode} fitter={fitter} "
          f"solver={solver} tier={tier} (device ms/frame):")
    for s, ms in per.items():
        print(f"  {s:<28}{ms / FRAMES:>9.3f}")
    print(f"  {'(unattributed)':<28}{other / FRAMES:>9.3f}")
    print(f"  {'total busy':<28}{total / FRAMES:>9.3f}")
    print(f"  {'device idle (span-busy)':<28}"
          f"{(span - busy) / FRAMES:>9.3f}")
    print(f"  {'span':<28}{span / FRAMES:>9.3f}")

    # top unattributed ops
    smap = xplane.scope_map_from_hlo(hlo)
    agg = {}
    for op_text, dur in xplane.device_op_durations(logdir):
        inst = xplane._event_inst_name(op_text)
        if smap.get(inst) is None and not any(
                s in op_text for s in xplane.STAGE_SCOPES):
            agg[op_text[:140]] = agg.get(op_text[:140], 0.0) + dur / 1e9
    # map instruction name -> HLO metadata (source op + file:line) so
    # the unattributed copies/pads name the jaxpr op that produced them
    import re
    meta = {}
    for m in re.finditer(
            r"%?([\w.\-]+)\s*=[^\n]*metadata=\{([^}]*)\}", hlo):
        inst, md = m.group(1), m.group(2)
        on = re.search(r'op_name="([^"]*)"', md)
        sf = re.search(r'source_file="([^"]*)"', md)
        sl = re.search(r"source_line=(\d+)", md)
        meta[inst] = (f"{on.group(1) if on else '?'} "
                      f"[{(sf.group(1).rsplit('/', 1)[-1] if sf else '?')}"
                      f":{sl.group(1) if sl else '?'}]")
    print("top unattributed ops (ms/frame):")
    for name, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:15]:
        inst = xplane._event_inst_name(name)
        print(f"  {ms/FRAMES:8.3f}  {name}")
        if inst in meta:
            print(f"            -> {meta[inst][:160]}")

    # per-scope op drill-down: TRACE_SCOPE=warp_fixup (substring match)
    scope = os.environ.get("TRACE_SCOPE")
    if scope:
        agg2 = {}
        for op_text, dur in xplane.device_op_durations(logdir):
            inst = xplane._event_inst_name(op_text)
            sc = smap.get(inst)
            if (sc and scope in sc) or scope in op_text:
                agg2[op_text[:140]] = (agg2.get(op_text[:140], 0.0)
                                       + dur / 1e9)
        print(f"top ops inside scope ~'{scope}' (ms/frame):")
        for name, ms in sorted(agg2.items(), key=lambda kv: -kv[1])[:20]:
            inst = xplane._event_inst_name(name)
            print(f"  {ms/FRAMES:8.3f}  {name}")
            if inst in meta:
                print(f"            -> {meta[inst][:160]}")


if __name__ == "__main__":
    main()

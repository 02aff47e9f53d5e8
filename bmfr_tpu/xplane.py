"""XPlane trace parsing: per-stage on-device timings.

The reference reports per-kernel device times from CL events
(opencl/bmfr.cpp:386-412, 488-517; CLUtils.hpp:439-494). The TPU
equivalent: capture an XLA profiler trace (``profiling.trace``), parse
the ``.xplane.pb`` protobuf it writes, and attribute each device op's
duration to a pipeline stage via the ``jax.named_scope`` annotations the
pipeline carries (bmfr_tpu/pipeline/denoise.py).

The xplane schema is decoded with a minimal protobuf wire-format reader
(no tensorflow/tensorboard dependency): XSpace { planes=1 }, XPlane
{ name=2, lines=3, event_metadata=4 (map) }, XLine { name=2, events=4 },
XEvent { metadata_id=1, offset_ps=2, duration_ps=3 }, XEventMetadata
{ id=1, name=2, display_name=4 }.
"""

from __future__ import annotations

import glob
import os
from collections import defaultdict

#: Stage scope names emitted by the pipeline (jax.named_scope) in
#: reference kernel order (opencl/bmfr.cpp:446-476).
STAGE_SCOPES = (
    # warp sub-scopes first: the matcher takes the first scope substring
    # found in op_name, and these nest inside warp_taps
    "warp_pack",
    "warp_plan",
    "warp_kernel",
    "warp_fixup_compact",
    "warp_fixup_scatter",
    "warp_fixup",
    "warp_fallback",
    "warp_taps",
    "state_pack",
    "k1_accumulate_noisy",
    "k2_blockify",
    "k2_fitter",
    "k3_weighted_sum",
    "k4_accumulate_filtered",
    "k5_taa",
)


class _Wire:
    def __init__(self, buf, start=0, end=None):
        self.buf = buf
        self.pos = start
        self.end = len(buf) if end is None else end

    def varint(self):
        v = 0
        shift = 0
        while True:
            b = self.buf[self.pos]
            self.pos += 1
            v |= (b & 0x7F) << shift
            if not b & 0x80:
                return v
            shift += 7

    def fields(self):
        """Yield (field_number, wire_type, value_or_span)."""
        while self.pos < self.end:
            tag = self.varint()
            fnum, wtype = tag >> 3, tag & 7
            if wtype == 0:
                yield fnum, 0, self.varint()
            elif wtype == 1:
                v = self.buf[self.pos : self.pos + 8]
                self.pos += 8
                yield fnum, 1, v
            elif wtype == 2:
                ln = self.varint()
                span = (self.pos, self.pos + ln)
                self.pos += ln
                yield fnum, 2, span
            elif wtype == 5:
                v = self.buf[self.pos : self.pos + 4]
                self.pos += 4
                yield fnum, 5, v
            else:
                raise IOError(f"unsupported wire type {wtype}")


def _parse_event(buf, span):
    md_id = offset_ps = dur_ps = 0
    for fnum, wt, val in _Wire(buf, *span).fields():
        if fnum == 1 and wt == 0:
            md_id = val
        elif fnum == 2 and wt == 0:
            offset_ps = val
        elif fnum == 3 and wt == 0:
            dur_ps = val
    return md_id, offset_ps, dur_ps


def exclusive_durations(events):
    """events: [(name, offset_ps, dur_ps)] of ONE line. Control-flow ops
    (cond/while) appear as parent events containing their body ops;
    return per-event durations with contained child time subtracted."""
    order = sorted(range(len(events)), key=lambda i: (events[i][1],
                                                      -events[i][2]))
    out = [list(e) + [e[2]] for e in events]  # name, off, dur, exclusive
    stack = []
    for i in order:
        name, off, dur = events[i]
        while stack and off >= events[stack[-1]][1] + events[stack[-1]][2]:
            stack.pop()
        if stack and off + dur <= (events[stack[-1]][1]
                                   + events[stack[-1]][2]):
            out[stack[-1]][3] -= dur   # direct parent loses child's time
        stack.append(i)
    return [(n, o, d, max(x, 0)) for n, o, d, x in out]


def _parse_line(buf, span):
    name = ""
    events = []
    for fnum, wt, val in _Wire(buf, *span).fields():
        if fnum == 2 and wt == 2:
            name = buf[val[0] : val[1]].decode("utf-8", "replace")
        elif fnum == 4 and wt == 2:
            events.append(_parse_event(buf, val))
    return name, events


def _parse_event_metadata(buf, span):
    md_id = 0
    name = display = ""
    for fnum, wt, val in _Wire(buf, *span).fields():
        if fnum == 1 and wt == 0:
            md_id = val
        elif fnum == 2 and wt == 2:
            name = buf[val[0] : val[1]].decode("utf-8", "replace")
        elif fnum == 4 and wt == 2:
            display = buf[val[0] : val[1]].decode("utf-8", "replace")
    return md_id, (display or name)


def _parse_plane(buf, span):
    name = ""
    lines = []
    meta = {}
    for fnum, wt, val in _Wire(buf, *span).fields():
        if fnum == 2 and wt == 2:
            name = buf[val[0] : val[1]].decode("utf-8", "replace")
        elif fnum == 3 and wt == 2:
            lines.append(_parse_line(buf, val))
        elif fnum == 4 and wt == 2:
            # map entry { key=1, value=2 (XEventMetadata) }
            for f2, w2, v2 in _Wire(buf, *val).fields():
                if f2 == 2 and w2 == 2:
                    mid, mname = _parse_event_metadata(buf, v2)
                    meta[mid] = mname
    return name, lines, meta


def parse_xspace(path):
    """Parse one .xplane.pb file -> list of (plane_name, lines, meta)."""
    with open(path, "rb") as f:
        buf = f.read()
    planes = []
    for fnum, wt, val in _Wire(buf).fields():
        if fnum == 1 and wt == 2:
            planes.append(_parse_plane(buf, val))
    return planes


def find_xplane_files(logdir):
    return sorted(glob.glob(
        os.path.join(logdir, "plugins", "profile", "*", "*.xplane.pb")))


def device_op_durations(logdir, line_filter=("XLA Ops",),
                        exclusive=True):
    """Device-plane op events: list of (op_text, duration_ps).

    Restricted to the "XLA Ops" line (module/overlay lines double-count
    everything); with ``exclusive`` the durations of control-flow parent
    events (cond/while) have their contained children subtracted so the
    totals count device time exactly once.
    """
    out = []
    for path in find_xplane_files(logdir):
        for name, lines, meta in parse_xspace(path):
            if "/device:TPU" not in name and "TPU" not in name.split()[0]:
                continue
            for line_name, events in lines:
                if line_filter and line_name not in line_filter:
                    continue
                named = [(meta.get(md, str(md)), off, dur)
                         for md, off, dur in events]
                if exclusive:
                    for n, _o, _d, x in exclusive_durations(named):
                        out.append((n, x))
                else:
                    for n, _o, d in named:
                        out.append((n, d))
    return out


def device_busy_span(logdir, line_filter=("XLA Ops",)):
    """(busy_ms, span_ms): summed event time vs wall span (first event
    start to last event end) on the device op line. ``span - busy`` is
    device idle — dispatch gaps, DMA waits outside ops, kernel launch
    tails — which per-op attribution can never show; the difference
    between the stage table's total and the fenced frame time lives
    here (VERDICT r2 weak #7)."""
    busy = 0.0
    lo, hi = None, 0
    for path in find_xplane_files(logdir):
        for name, lines, meta in parse_xspace(path):
            if "/device:TPU" not in name and "TPU" not in name.split()[0]:
                continue
            for line_name, events in lines:
                if line_filter and line_name not in line_filter:
                    continue
                named = [(meta.get(md, str(md)), off, dur)
                         for md, off, dur in events]
                for _n, off, _d, x in exclusive_durations(named):
                    busy += x
                for _n, off, dur in named:
                    lo = off if lo is None else min(lo, off)
                    hi = max(hi, off + dur)
    span = 0 if lo is None else hi - lo
    return busy / 1e9, span / 1e9


def scope_map_from_hlo(hlo_text, scopes=STAGE_SCOPES):
    """instruction name -> stage scope, parsed from compiled HLO text
    (the trace's op events carry the HLO text but not the op_name
    metadata; the metadata lives in the compiled module)."""
    import re

    out = {}
    for m in re.finditer(
            r"%?([\w.\-]+) = [^\n]*?op_name=\"([^\"]*)\"", hlo_text):
        inst, op_name = m.group(1), m.group(2)
        for scope in scopes:
            if scope in op_name:
                out[inst] = scope
                break
    return out


def _event_inst_name(op_text):
    """'%fusion.23 = f32[...' -> 'fusion.23'."""
    head = op_text.split(" ", 1)[0]
    return head[1:] if head.startswith("%") else head


def stage_device_times(logdir, scopes=STAGE_SCOPES, hlo_text=None):
    """Aggregate exclusive device op durations by pipeline stage scope.

    Attribution: the op's instruction name is looked up in the compiled
    module's op_name metadata (``hlo_text``); ops without a match fall
    back to substring search in the event text. Returns
    ``(per_stage_ms, other_ms, total_ms)``.
    """
    smap = scope_map_from_hlo(hlo_text, scopes) if hlo_text else {}
    per = defaultdict(float)
    other = 0.0
    total = 0.0
    for op_text, dur_ps in device_op_durations(logdir):
        ms = dur_ps / 1e9
        total += ms
        scope = smap.get(_event_inst_name(op_text))
        if scope is None:
            for s in scopes:
                if s in op_text:
                    scope = s
                    break
        if scope is None:
            other += ms
        else:
            per[scope] += ms
    ordered = {s: per.get(s, 0.0) for s in scopes}
    return ordered, other, total

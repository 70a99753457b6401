"""Minimal raw-protobuf XSpace parser for jax.profiler traces.

No tensorboard/tensorflow proto bindings needed (none are importable in
this image): walks the wire format by field number.  Usage:

    with jax.profiler.trace("/tmp/trace"): ...
    python scripts/xplane_summary.py "/tmp/trace/**/*.xplane.pb"

Prints per-plane line totals (XLA Ops / Steps / Modules on the device
plane = device-busy time) and the top events by summed duration — the
tool behind BASELINE.md's devplan step decomposition.

Minimal raw-protobuf XSpace parser: per-plane, per-line summed event
durations and top event metadata names by total duration."""
import sys, glob, collections


class TruncatedProto(ValueError):
    """Raised on a truncated/corrupt .xplane.pb instead of a bare
    IndexError from past-the-buffer reads."""


def varint(buf, i):
    r = 0
    s = 0
    n = len(buf)
    while True:
        if i >= n:
            raise TruncatedProto(
                f"varint runs past the buffer at offset {i}/{n} "
                "(truncated or corrupt .xplane.pb)")
        b = buf[i]
        i += 1
        r |= (b & 0x7F) << s
        if not b & 0x80:
            return r, i
        s += 7


def fields(buf):
    i = 0
    n = len(buf)
    while i < n:
        key, i = varint(buf, i)
        fn, wt = key >> 3, key & 7
        if wt == 0:
            v, i = varint(buf, i)
            yield fn, v
        elif wt == 2:
            ln, i = varint(buf, i)
            if i + ln > n:
                raise TruncatedProto(
                    f"length-delimited field {fn} ({ln} B) runs past "
                    f"the buffer at offset {i}/{n}")
            yield fn, buf[i:i + ln]
            i += ln
        elif wt == 5:
            if i + 4 > n:
                raise TruncatedProto(
                    f"fixed32 field {fn} runs past the buffer at "
                    f"offset {i}/{n}")
            yield fn, buf[i:i + 4]
            i += 4
        elif wt == 1:
            if i + 8 > n:
                raise TruncatedProto(
                    f"fixed64 field {fn} runs past the buffer at "
                    f"offset {i}/{n}")
            yield fn, buf[i:i + 8]
            i += 8
        else:
            raise ValueError(f"wire type {wt}")


def _as_int(v):
    """Integer view of a field matched by number: varints arrive as
    int, fixed32/64 as little-endian bytes (schema wire-type drift
    stays arithmetic-safe instead of raising TypeError mid-sum)."""
    if isinstance(v, int):
        return v
    if isinstance(v, (bytes, bytearray)):
        return int.from_bytes(v, "little")
    raise TruncatedProto(f"expected integer field, got {type(v).__name__}")


def _as_text(v):
    return (v.decode("utf-8", "replace")
            if isinstance(v, (bytes, bytearray)) else str(v))


def parse(path):
    data = open(path, "rb").read()
    for fn, v in fields(data):
        if fn != 1 or not isinstance(v, (bytes, bytearray)):
            continue
        plane = v
        pname = ""
        lines = []
        meta = {}
        for pf, pv in fields(plane):
            if pf == 2:
                pname = _as_text(pv)
            elif pf == 3 and isinstance(pv, (bytes, bytearray)):
                lines.append(pv)
            elif pf == 4:  # map<int64, XEventMetadata>
                mid, mname = None, ""
                for mf, mv in fields(pv):
                    if mf == 1:
                        mid = _as_int(mv)
                    elif mf == 2 and isinstance(mv, (bytes, bytearray)):
                        for ef, ev in fields(mv):
                            if ef == 1:
                                mid = _as_int(ev)
                            elif ef == 2:
                                mname = _as_text(ev)
                if mid is not None:
                    meta[mid] = mname
        line_tot = {}
        ev_tot = collections.Counter()
        for line in lines:
            lname = ""
            tot = 0
            for lf, lv in fields(line):
                if lf == 2:
                    lname = _as_text(lv)
                elif lf == 4 and isinstance(lv, (bytes, bytearray)):  # XEvent
                    mid = None
                    dur = 0
                    for ef, ev in fields(lv):
                        if ef == 1:
                            mid = _as_int(ev)
                        elif ef == 3:
                            dur = _as_int(ev)
                    tot += dur
                    ev_tot[meta.get(mid, str(mid))] += dur
            line_tot[lname] = line_tot.get(lname, 0) + tot
        yield pname, line_tot, ev_tot


if __name__ == "__main__":
    pat = sys.argv[1] if len(sys.argv) > 1 else "/tmp/devplan_trace/**/*.xplane.pb"
    for f in glob.glob(pat, recursive=True):
        for pname, line_tot, ev_tot in parse(f):
            interesting = {n: round(v / 1e9, 2) for n, v in
                           sorted(line_tot.items(), key=lambda kv: -kv[1])[:8]
                           if v > 0}
            if not interesting:
                continue
            print(f"== plane {pname!r}: line totals ms {interesting}")
            for name, v in ev_tot.most_common(12):
                print(f"   {v/1e9:10.2f} ms  {name[:100]}")

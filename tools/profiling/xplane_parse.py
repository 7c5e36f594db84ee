"""Parse a jax.profiler xplane.pb and print top HLO ops by self time.

The env ships no xplane_pb2; compile the local minimal mirror
(xplane.proto) with protoc on first use.

Usage: python xplane_parse.py [logdir=/tmp/jaxtrace] [steps=5] [top=48]
"""
import glob
import os
import subprocess
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))


def _xplane_pb2():
    gen = os.path.join(_HERE, "_xplane_gen")
    os.makedirs(gen, exist_ok=True)
    if not os.path.exists(os.path.join(gen, "xplane_pb2.py")):
        subprocess.run(
            ["protoc", f"--proto_path={_HERE}", f"--python_out={gen}",
             "xplane.proto"], check=True)
    sys.path.insert(0, gen)
    import xplane_pb2  # noqa: E402
    return xplane_pb2


def top_ops(logdir, steps=5, top=48):
    paths = sorted(glob.glob(logdir + "/**/*.xplane.pb", recursive=True))
    if not paths:
        print("no xplane files under", logdir)
        return []
    pb = _xplane_pb2()
    xs = pb.XSpace()
    with open(paths[-1], "rb") as f:
        xs.ParseFromString(f.read())
    rows = []
    for plane in xs.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name:
            continue
        ev_meta = {m: plane.event_metadata[m].name
                   for m in plane.event_metadata}
        # device planes also carry module/step-level lines whose events
        # NEST the op events — summing every line double-counts. Keep
        # only the XLA-op line(s); fall back to all lines if none match.
        op_lines = [ln for ln in plane.lines
                    if "XLA Ops" in ln.name or ln.name == "Ops"]
        totals = {}
        for line in op_lines or plane.lines:
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, "?")
                totals[name] = totals.get(name, 0) + ev.duration_ps
        rows = sorted(totals.items(), key=lambda kv: -kv[1])[:top]
        print(f"== plane: {plane.name} (op lines: "
              f"{len(op_lines) or len(plane.lines)}) ==")
        tot = sum(totals.values())
        print(f"   total device time: {tot/1e9/steps:.2f} ms/step")
        for name, ps in rows:
            print(f"{ps/1e9/steps:10.3f} ms  {name[:110]}")
        break
    return rows


if __name__ == "__main__":
    logdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jaxtrace"
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    top = int(sys.argv[3]) if len(sys.argv) > 3 else 48
    top_ops(logdir, steps, top)

"""Minimal xplane.pb parser: compiles scripts/xplane.proto on demand.

The TensorBoard profiler plugin's converter is broken in this image;
this standalone schema covers what the trace scripts need (planes,
lines, events, metadata names, durations).
"""

import os
import subprocess
import sys
import tempfile

_DIR = os.path.dirname(os.path.abspath(__file__))


def load_xplane_pb2():
    """Import (building if needed) the generated xplane_pb2 module."""
    gen = os.path.join(tempfile.gettempdir(), "ganon_tpu_xplane")
    os.makedirs(gen, exist_ok=True)
    if not os.path.exists(os.path.join(gen, "xplane_pb2.py")):
        subprocess.run(
            ["protoc", f"--proto_path={_DIR}", f"--python_out={gen}",
             "xplane.proto"],
            check=True,
        )
    if gen not in sys.path:
        sys.path.insert(0, gen)
    import xplane_pb2

    return xplane_pb2


def op_durations(xplane_path: str, plane_substr: str = "TPU") -> dict:
    """{op_name: total_duration_seconds} for the matching device plane."""
    xp = load_xplane_pb2()
    sp = xp.XSpace()
    with open(xplane_path, "rb") as f:
        sp.ParseFromString(f.read())
    for pl in sp.planes:
        if plane_substr not in pl.name:
            continue
        md = pl.event_metadata
        durs: dict = {}
        for ln in pl.lines:
            for ev in ln.events:
                name = md[ev.metadata_id].name if ev.metadata_id in md else "?"
                durs[name] = durs.get(name, 0.0) + ev.duration_ps / 1e12
        return durs
    return {}

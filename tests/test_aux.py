"""Aux subsystems: progress, GUI wizard, distributed helpers."""

import io

import numpy as np

from metafast_tpu.gui import run_wizard
from metafast_tpu.utils.progress import Progress, memory_used_str


def test_progress_line():
    buf = io.StringIO()
    p = Progress(total=100, prefix="reads", stream=buf, min_interval=0,
                 enabled=True)
    p.update(add=50)
    p.update(add=25)
    p.close("done")
    out = buf.getvalue()
    assert "50" in out and "75.0%" in out and "ETA" in out
    assert out.endswith("done\n")


def test_progress_disabled_on_non_tty():
    buf = io.StringIO()
    p = Progress(total=10, stream=buf)   # StringIO.isatty() is False
    p.update(add=5)
    p.close()
    assert buf.getvalue() == ""


def test_memory_used_str():
    s = memory_used_str()
    assert s.endswith("MB") or s.endswith("GB")


def test_wizard_builds_command_without_running():
    inputs = iter(["view", "5", "", "", "", "", "", "n"])
    outs = []
    rc = run_wizard(input_fn=lambda prompt: next(inputs),
                    print_fn=lambda *a: outs.append(" ".join(map(str, a))))
    assert rc == 0
    cmd = [o for o in outs if "Command:" in o]
    assert cmd and "-t view" in cmd[0]


def test_wizard_runs_tool(tmp_path):
    from metafast_tpu.io import binfmt
    fp = tmp_path / "x.kmers.bin"
    binfmt.write_kmers_bin(str(fp), np.array([5], dtype=np.int64),
                           np.array([3], dtype=np.int32))
    out = tmp_path / "out.txt"
    # tool=view, k=5, kmers-file, components-file skip, output-file, long skip
    inputs = iter(["view", "5", str(fp), "", str(out), "",
                   str(tmp_path / "wd"), "y"])
    rc = run_wizard(input_fn=lambda prompt: next(inputs),
                    print_fn=lambda *a: None)
    assert rc == 0
    assert out.read_text().startswith("Kmer\tCount")


def test_per_host_files():
    from metafast_tpu.parallel.distributed import per_host_files
    files = ["a", "b", "c", "d", "e"]
    assert per_host_files(files, 0, 2) == ["a", "c", "e"]
    assert per_host_files(files, 1, 2) == ["b", "d"]

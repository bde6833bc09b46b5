"""Multi-process smoke test: jax.distributed over a 2-process CPU 'pod'.

Exercises parallel/distributed.py for real (VERDICT r1 #8): two separate
processes initialize a jax.distributed job over a localhost coordinator,
split the sample files with per_host_files, count their own slice
(data-parallel over samples — the multi-host analog of
kmer-counter-many's per-sample loop), and allgather the per-sample
tables; process 0 checks the union equals a single-process count.
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

WORKER = r"""
import json, sys
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")

pid = int(sys.argv[1]); coord = sys.argv[2]; out = sys.argv[3]
files = sys.argv[4:]

from metafast_tpu.parallel import distributed as dist
dist.initialize(coordinator_address=coord, num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()

mine = dist.per_host_files(files)
# every chip in the job is visible to every process (addressable or not)
mesh = dist.global_mesh()
assert mesh.devices.size == jax.device_count() >= 2

from metafast_tpu import api
import hashlib
tables = {}
for f in mine:
    keys, counts, stats = api.count_reads_files([f], 11)
    dig = hashlib.sha256(keys.tobytes() + counts.astype(np.int32).tobytes())
    tables[f] = [int(len(keys)), int(counts.sum()), dig.hexdigest()]

# cross-process exchange: allgather the per-host results over DCN
from jax.experimental import multihost_utils
blob = json.dumps(tables).encode()
pad = 1 << 12
assert len(blob) < pad
buf = np.zeros(pad, np.uint8)
buf[:len(blob)] = np.frombuffer(blob, np.uint8)
lens = multihost_utils.process_allgather(np.array([len(blob)]))
both = multihost_utils.process_allgather(buf)
if pid == 0:
    merged = {}
    for i in range(2):
        merged.update(json.loads(bytes(both[i][:int(lens[i][0])]).decode()))
    with open(out, "w") as fh:
        json.dump(merged, fh)
multihost_utils.sync_global_devices("done")
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_count(tmp_path, ref_data):
    files = [str(ref_data / f"meta_test_{i}.fa") for i in (1, 2, 3)]
    out = tmp_path / "merged.json"
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    repo = str(Path(__file__).resolve().parent.parent)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(pid), coord, str(out)] + files,
        env=env, cwd=repo, stdout=subprocess.PIPE, stderr=subprocess.PIPE)
        for pid in (0, 1)]
    outs = []
    for p in procs:
        so, se = p.communicate(timeout=300)
        outs.append((p.returncode, so.decode(), se.decode()))
    assert all(rc == 0 for rc, _, _ in outs), outs

    merged = json.loads(out.read_text())
    assert set(Path(f).name for f in merged) == {
        "meta_test_1.fa", "meta_test_2.fa", "meta_test_3.fa"}

    # oracle: single-process counts must match the union of per-host work
    import hashlib
    import jax
    from metafast_tpu import api
    with jax.default_device(jax.devices("cpu")[0]):
        for f in files:
            keys, counts, _ = api.count_reads_files([f], 11)
            dig = hashlib.sha256(
                keys.tobytes() + counts.astype(np.int32).tobytes())
            assert merged[f] == [len(keys), int(counts.sum()),
                                 dig.hexdigest()], f

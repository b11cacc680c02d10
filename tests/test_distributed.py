"""Multi-host bootstrap smoke test: two REAL processes through
jax.distributed (parallel/distributed.py), the analog of the reference's
dist.init_process_group("nccl") bring-up (reference train.py:184-186).

Each process pins the CPU platform with 2 virtual devices, initializes the
distributed runtime against a shared coordinator, builds the global data
mesh, and:

  * psums ones over all 4 global devices (DCN collective smoke);
  * walks its DataLoader shard (shard_id = process_id) and reports the
    sample indices it saw.

The parent asserts both processes agree on the psum total and that their
loader shards are disjoint and covering — the multi-host contract the
single-process tests (test_data.py, test_parallel.py) can only simulate.
"""
import json
import os
import socket
import subprocess
import sys

import pytest

WORKER = r"""
import json, os, sys
import jax
import jax.numpy as jnp

from transparent_object_detection_tpu.parallel.distributed import (
    initialize_multihost, process_count, process_index,
)

pid = int(sys.argv[1])
coord = sys.argv[2]
ok = initialize_multihost(coordinator_address=coord, num_processes=2, process_id=pid)
assert ok, "initialize_multihost returned False for a 2-process run"
assert process_count() == 2, f"process_count {process_count()} on {jax.default_backend()}"
assert process_index() == pid
ndev = len(jax.devices())

from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

mesh = Mesh(jax.devices(), ("data",))  # all 4 global devices

# global psum over DCN: each device contributes its ones(4, 4) block
sharding = NamedSharding(mesh, P("data"))
local = [jax.device_put(jnp.ones((1, 4)), d) for d in jax.local_devices()]
garr = jax.make_array_from_single_device_arrays((ndev, 4), sharding, local)
total = jax.jit(
    lambda x: jnp.sum(x), out_shardings=NamedSharding(mesh, P())
)(garr)
psum_total = float(jax.device_get(
    total.addressable_shards[0].data if total.addressable_shards else total
))

# loader sharding: this process walks only its shard of the dataset
from transparent_object_detection_tpu.data.loader import DataLoader

class _Stub:
    epoch_now = 0
    def __len__(self):
        return 12

loader = DataLoader(_Stub(), batch_size=2, shuffle=False, num_workers=1,
                    shard_id=pid, num_shards=2)
seen = sorted(int(i) for i in loader._epoch_indices())

print("RESULT " + json.dumps({
    "pid": pid, "ndev": ndev, "psum": psum_total, "seen": seen,
}), flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_bootstrap_and_loader_shards(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    coord = f"127.0.0.1:{_free_port()}"
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # Drop sitecustomize dirs (e.g. a TPU-tunnel hook) from PYTHONPATH: they
    # can re-pin jax_platforms inside the worker, overriding JAX_PLATFORMS.
    inherited = [
        p for p in os.environ.get("PYTHONPATH", "").split(os.pathsep)
        if p and "site" not in os.path.basename(p)
    ]
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
        PYTHONPATH=os.pathsep.join([repo_root] + inherited),
    )
    env.pop("JAX_NUM_PROCESSES", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), coord],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=420)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT ")][-1]
        outs.append(json.loads(line[len("RESULT "):]))

    by_pid = {o["pid"]: o for o in outs}
    assert set(by_pid) == {0, 1}
    # 2 processes x 2 virtual devices = 4 global devices; psum of ones(4,4)
    for o in outs:
        assert o["ndev"] == 4
        assert o["psum"] == 16.0
    # shards are disjoint and cover the dataset
    seen0, seen1 = set(by_pid[0]["seen"]), set(by_pid[1]["seen"])
    assert seen0.isdisjoint(seen1)
    assert seen0 | seen1 == set(range(12))

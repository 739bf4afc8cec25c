"""Multi-host (2-process) data-parallel training over CPU gloo collectives.

VERDICT r2 #7: the --distributed path must load per-process shards and
assemble global arrays with jax.make_array_from_process_local_data — no
device_put onto non-addressable devices.  This launches TWO real jax
processes (jax.distributed.initialize over localhost), each owning one CPU
device, and checks: disjoint loader shards, lockstep DP steps, identical
pmean-reduced losses on both processes.
"""

import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # compile-heavy lane (see pyproject.toml)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = """
import os, sys
pid = int(sys.argv[1]); port = sys.argv[2]; data_dir = sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.distributed.initialize(coordinator_address="localhost:" + port,
                           num_processes=2, process_id=pid,
                           local_device_ids=[0])
assert jax.process_count() == 2, jax.process_count()
import numpy as np
import jax.numpy as jnp
from enhanced_unet_tpu.config import get_preset
from enhanced_unet_tpu.data.dataset import CellDataset
from enhanced_unet_tpu.data.loader import BatchLoader
from enhanced_unet_tpu.models import get_model
from enhanced_unet_tpu.parallel import (
    make_dp_train_step, make_global_batch, make_mesh, replicate_state,
)
from enhanced_unet_tpu.train.trainer import create_train_state

ds = CellDataset(data_dir, split="train", max_size=32)
loader = BatchLoader(ds, 1, (32, 32), train=True, seed=0, prefetch=0,
                     process_shard=(pid, 2))
cfg = get_preset("unet", num_epochs=2, overrides={"batch_size": 1})
mesh = make_mesh(2)
model = get_model("unet_basic", dtype=jnp.float32)
state = create_train_state(model, cfg, steps_per_epoch=len(loader),
                           rng=jax.random.key(0),
                           input_shape=(1, 32, 32, 3))
state = replicate_state(state, mesh)
dp_step = make_dp_train_step(cfg, mesh)

losses = []
seen = []
for batch in loader:
    seen.extend(i["image_id"] for i in batch["batch_items"])
    images, masks, valid = make_global_batch(
        (batch["images"], batch["semantic_masks"], batch["valid_mask"]), mesh)
    assert images.shape[0] == 2  # global batch from 2 x local-1
    state, metrics = dp_step(state, images, masks, valid, jax.random.key(1))
    losses.append(float(metrics["loss"]))
assert all(np.isfinite(l) for l in losses), losses
print("RESULT", pid, ",".join(f"{l:.6f}" for l in losses), "|", ",".join(sorted(map(str, seen))))
"""


def test_two_process_dp_training(tmp_path):
    sys.path.insert(0, os.path.dirname(__file__))
    from synthdata import make_synthetic_dataset

    data_dir = str(tmp_path / "data")
    make_synthetic_dataset(data_dir, n_images=8, size=32)
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    with socket.socket() as s:  # free port for the coordinator
        s.bind(("localhost", 0))
        port = str(s.getsockname()[1])

    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env.pop("XLA_FLAGS", None)  # 1 local device per process
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), port, data_dir],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out

    results = {}
    for out in outs:
        line = [l for l in out.splitlines() if l.startswith("RESULT")][0]
        _, pid, losses, _, ids = line.split(" ", 4)
        results[pid] = (losses, ids)
    # pmean-reduced losses identical on both processes (lockstep collectives)
    assert results["0"][0] == results["1"][0], results
    # disjoint image shards
    ids0 = set(results["0"][1].split(","))
    ids1 = set(results["1"][1].split(","))
    assert ids0 and ids1 and not (ids0 & ids1), (ids0, ids1)

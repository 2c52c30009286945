"""True multi-process distributed test: two OS processes join a
jax.distributed process group over localhost (gloo CPU collectives), build
a global mesh, and run a data-parallel forward + gradient psum — the
multi-host path the reference never tests without a cluster (SURVEY §4)."""
import os
import subprocess
import sys

import pytest

WORKER = r"""
import os
import sys
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)
jax.config.update("jax_cpu_collectives_implementation", "gloo")

proc_id = int(sys.argv[1])
from kotoba_whisper_tpu.parallel import multihost

multihost.initialize(
    coordinator_address=f"127.0.0.1:{int(sys.argv[2])}",
    num_processes=2,
    process_id=proc_id,
    init_timeout_s=60,
)
assert multihost.process_count() == 2
assert len(jax.devices()) == 4  # 2 local x 2 processes

import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from kotoba_whisper_tpu.core.mesh import MeshConfig, build_mesh
from kotoba_whisper_tpu.models import whisper
from kotoba_whisper_tpu.core.config import WhisperConfig

cfg = WhisperConfig(
    vocab_size=64, num_mel_bins=8, d_model=16, encoder_layers=1,
    encoder_attention_heads=2, decoder_layers=1, decoder_attention_heads=2,
    encoder_ffn_dim=32, decoder_ffn_dim=32, max_source_positions=8,
    max_target_positions=8, pad_token_id=0, bos_token_id=1, eos_token_id=1,
    decoder_start_token_id=2,
)
params = whisper.init_params(jax.random.key(0), cfg)
mesh = build_mesh(MeshConfig(data=4, model=1))

from jax.experimental import multihost_utils

with mesh:
    params = jax.device_put(
        params, jax.tree.map(lambda _: NamedSharding(mesh, P()), params)
    )
    # global batch 8 = 2 rows per local device
    local = np.full((4, cfg.num_mel_bins, 16), proc_id + 1, np.float32)
    global_mel = multihost_utils.host_local_array_to_global_array(
        local, mesh, P("data")
    )
    ids = multihost_utils.host_local_array_to_global_array(
        np.zeros((4, 3), np.int32), mesh, P("data")
    )

    def loss(p, mel, ids):
        logits, _ = whisper.forward(p, cfg, mel, ids)
        return jnp.mean(logits**2)

    val, grads = jax.jit(jax.value_and_grad(loss))(params, global_mel, ids)
    # loss/grads are global (psum over the data axis): every host reads the
    # same replicated scalar; cross-check via host-local allgather
    local_val = np.asarray([float(val)], np.float32)
    from kotoba_whisper_tpu.parallel.multihost import all_gather_host

    gathered = all_gather_host(local_val)
    assert gathered.shape[0] == 2
    assert np.allclose(gathered, gathered[0]), gathered

multihost.barrier("done")
print(f"WORKER_{proc_id}_OK", flush=True)
"""


@pytest.mark.slow
def test_two_process_data_parallel(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = dict(os.environ)
    env["PYTHONPATH"] = os.getcwd()
    env.pop("JAX_PLATFORMS", None)
    port = 12000 + os.getpid() % 20000
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for i, p in enumerate(procs):
        out, _ = p.communicate(timeout=300)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i}:\n{out[-3000:]}"
        assert f"WORKER_{i}_OK" in out


DECODE_WORKER = r"""
import os
import sys
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 1)
jax.config.update("jax_cpu_collectives_implementation", "gloo")

proc_id = int(sys.argv[1])
from kotoba_whisper_tpu.parallel import multihost

multihost.initialize(
    coordinator_address=f"127.0.0.1:{int(sys.argv[2])}",
    num_processes=2,
    process_id=proc_id,
    init_timeout_s=60,
)

import jax.numpy as jnp
import numpy as np

from kotoba_whisper_tpu.core.config import PRESETS, SpecialTokens
from kotoba_whisper_tpu.decode.greedy import (
    GenerateOptions, generate_greedy, transcribe_prompt,
)
from kotoba_whisper_tpu.models import whisper
from kotoba_whisper_tpu.parallel.multihost import (
    all_gather_host, pad_across_processes, shard_for_host,
)

cfg = PRESETS["test-byte"]
st = SpecialTokens.layout(n_text=256, n_langs=99)
params = whisper.init_params(jax.random.key(0), cfg)
rng = np.random.default_rng(7)
mels = (rng.standard_normal((4, cfg.num_mel_bins, 3000)) * 0.2).astype(np.float32)
opts = GenerateOptions(
    prompt_ids=transcribe_prompt(st, st.lang_begin + 6), max_length=16
)
stops = np.asarray([6, 8, 10, 13])

# the DP inference loop of run_pseudo_labelling.py:330-345: each process
# decodes its shard, trims to local content length, pads across processes,
# all-gathers — every host ends with the full global batch
rows = shard_for_host(list(range(4)))
local = np.asarray(generate_greedy(
    params, cfg, jnp.asarray(mels[rows]), opts, st,
    stop_at=jnp.asarray(stops[rows], np.int32),
))
local = local[:, : int(stops[rows].max())]        # ragged per-host trim
padded = pad_across_processes(local, axis=1, pad_value=cfg.pad_token_id)
gathered = all_gather_host(padded)
row_ids = all_gather_host(np.asarray(rows, np.int64))

assert gathered.shape[0] == 4, gathered.shape
full = np.asarray(generate_greedy(
    params, cfg, jnp.asarray(mels), opts, st,
    stop_at=jnp.asarray(stops, np.int32),
))[:, : gathered.shape[1]]
for k, r in enumerate(row_ids):
    np.testing.assert_array_equal(gathered[k], full[r])

multihost.barrier("done")
print(f"WORKER_{proc_id}_OK", flush=True)
"""


@pytest.mark.slow
def test_two_process_dp_pseudo_label_decode(tmp_path):
    """2-process DP decode with cross-process pad + gather (the reference's
    pad_across_processes/gather_for_metrics loop,
    run_pseudo_labelling.py:330-345; VERDICT r2 #8)."""
    script = tmp_path / "decode_worker.py"
    script.write_text(DECODE_WORKER)
    env = dict(os.environ)
    env["PYTHONPATH"] = os.getcwd()
    env.pop("JAX_PLATFORMS", None)
    port = 12000 + (os.getpid() + 101) % 20000
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for i, p in enumerate(procs):
        out, _ = p.communicate(timeout=300)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i}:\n{out[-3000:]}"
        assert f"WORKER_{i}_OK" in out

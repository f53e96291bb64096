"""Multi-host (DCN) batch-cover dryrun on two local jax.distributed
processes (VERDICT r3 #6; SURVEY §2.2/§5.8).

The scaling story for batch cover generation across HOSTS: songs are
independent, so the host axis shards the SONG LIST (the only DCN traffic
is the work split + results), while each host's chips run the DP(xTP)
chunk mesh over ICI. This dryrun certifies both halves without real
multi-host hardware:

  1. two local processes join one jax.distributed job (CPU backend,
     4 virtual devices each -> 8 global devices), build a GLOBAL
     ("host", "data") mesh, and run a jitted cross-host collective over
     it (the DCN path compiles AND executes)
  2. each process converts its shard of a 3-song batch-cover job on a
     LOCAL device mesh; process 0 gathers and compares against a
     single-process conversion of the full list (<= 1 int16 ulp, the
     established cross-mesh bound)

Run:  python tools/dcn_dryrun.py          (launcher; spawns the 2 workers)
      python tools/dcn_dryrun.py --proc N --port P --out DIR   (worker)
"""

import json
import os
import socket
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_PROC = 2
LOCAL_DEVICES = 4


def _songs():
    import numpy as np

    out = []
    for i, (seconds, hz) in enumerate([(7.0, 220.0), (5.0, 330.0), (6.0, 262.0)]):
        rng = np.random.default_rng(10 + i)
        t = np.arange(int(seconds * 16000)) / 16000
        out.append(
            (0.3 * np.sin(2 * np.pi * hz * t)
             + 0.01 * rng.standard_normal(t.size)).astype(np.float32)
        )
    return out


def _build_converter(mesh):
    from polgen_rvc_tpu.pipeline.config import EngineConfig
    from polgen_rvc_tpu.pipeline.factory import build_synthetic_converter

    eng = EngineConfig(x_pad=1, x_query=2, x_center=4, x_max=5,
                       chunk_batch=4, bucket_step_s=2)
    return build_synthetic_converter(
        tiny=True, sr=48000, index_vectors=64, engine=eng, mesh=mesh
    )


def worker(proc_id: int, port: int, out_dir: str):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={LOCAL_DEVICES}"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=N_PROC,
        process_id=proc_id,
    )
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    n_global = len(jax.devices())
    n_local = len(jax.local_devices())
    assert n_global == N_PROC * LOCAL_DEVICES, n_global
    assert n_local == LOCAL_DEVICES, n_local

    # --- 1) global ("host", "data") mesh: a cross-host collective must
    # compile and execute (this is the DCN leg on real pods)
    devs = np.asarray(jax.devices()).reshape(N_PROC, LOCAL_DEVICES)
    gmesh = Mesh(devs, ("host", "data"))
    local_rows = np.full((2, 8), float(proc_id + 1), np.float32)
    garr = jax.make_array_from_process_local_data(
        NamedSharding(gmesh, P("host", None)), local_rows,
        (2 * N_PROC, 8),
    )

    @jax.jit
    def host_sum(x):
        # reduction over the host-sharded axis => cross-host (DCN) traffic
        return jnp.sum(x, axis=0)

    got = np.asarray(host_sum(garr))
    want = np.full(8, sum(range(1, N_PROC + 1)) * 2.0, np.float32)
    np.testing.assert_array_equal(got, want)

    # --- 2) host-sharded batch cover: this host converts its shard of the
    # song list on a LOCAL chip mesh (songs are independent; on real pods
    # the only DCN traffic is this work split + the gathered results)
    from polgen_rvc_tpu.parallel.mesh import make_mesh
    from polgen_rvc_tpu.pipeline.config import ConversionOptions

    lmesh = make_mesh(n_data=LOCAL_DEVICES, n_model=1,
                      devices=jax.local_devices())
    vc = _build_converter(lmesh)
    songs = _songs()
    my_idx = [i for i in range(len(songs)) if i % N_PROC == proc_id]
    opts = ConversionOptions(index_rate=0.4, protect=0.2, seed=5)
    outs = vc.convert_batch([songs[i] for i in my_idx], opts)
    for i, (audio, sr) in zip(my_idx, outs):
        np.save(os.path.join(out_dir, f"song{i}.npy"), audio)
    with open(os.path.join(out_dir, f"proc{proc_id}.ok"), "w") as f:
        json.dump({"proc": proc_id, "songs": my_idx,
                   "global_devices": n_global}, f)
    print(f"worker {proc_id}: ok (songs {my_idx}, "
          f"{n_global} global devices)", flush=True)


def launcher():
    s = socket.create_server(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    out_dir = tempfile.mkdtemp(prefix="dcn_dryrun_")
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__),
             "--proc", str(i), "--port", str(port), "--out", out_dir],
        )
        for i in range(N_PROC)
    ]
    rcs = [p.wait(timeout=1800) for p in procs]
    assert all(rc == 0 for rc in rcs), f"worker rcs: {rcs}"
    for i in range(N_PROC):
        assert os.path.exists(os.path.join(out_dir, f"proc{i}.ok"))

    # single-process reference over the full song list
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={LOCAL_DEVICES}"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    from polgen_rvc_tpu.parallel.mesh import make_mesh
    from polgen_rvc_tpu.pipeline.config import ConversionOptions

    vc = _build_converter(make_mesh(n_data=LOCAL_DEVICES, n_model=1,
                                    devices=jax.devices()[:LOCAL_DEVICES]))
    songs = _songs()
    refs = vc.convert_batch(songs, ConversionOptions(index_rate=0.4,
                                                     protect=0.2, seed=5))
    worst = 0
    for i, (ref, _) in enumerate(refs):
        got = np.load(os.path.join(out_dir, f"song{i}.npy"))
        assert got.shape == ref.shape, (i, got.shape, ref.shape)
        d = np.abs(got.astype(np.int32) - ref.astype(np.int32))
        worst = max(worst, int(d.max()))
        assert d.max() <= 1, (i, d.max())
    print(f"DCN dryrun OK: {N_PROC} processes x {LOCAL_DEVICES} devices, "
          f"cross-host collective executed, sharded batch cover matches "
          f"single-host (max ulp diff {worst})")


if __name__ == "__main__":
    if "--proc" in sys.argv:
        argv = sys.argv
        worker(int(argv[argv.index("--proc") + 1]),
               int(argv[argv.index("--port") + 1]),
               argv[argv.index("--out") + 1])
    else:
        launcher()

"""Round-5 multi-chip scaling model: ICI + DCN tiers, untextured AND
texture-gradient payload classes.

Extends tools/scaling_model.py (which anchors the ICI/untextured case) per
the round-4 review: the north-star "1 chip → N hosts" crosses DCN (an order
of magnitude less bandwidth than ICI), and the eigen-faces/duck class of
multiview fits all-reduces a texture-ATLAS gradient every step (~MB, vs the
~12 KB untextured payload). Both payloads are MEASURED from compiled HLO
all-reduce shapes on the 8-device CPU lowering; step times are measured on
the real chip (untextured: the shard_map step from scaling_model.py;
textured: the duck fwd+bwd iteration, the flagship textured workload).

Ring all-reduce over N workers: T_ar = 2·B·(N−1)/N / BW + hops·t_hop,
hops = 2(N−1).

Interconnect figures (stated inputs, not measurements):
- ICI (within a v5e slice): 100 GB/s effective per-direction ring bandwidth
  (4 links × 400 Gbps ≈ 200 GB/s aggregate, halved for protocol overhead),
  t_hop = 1 µs.
- DCN (across hosts): v5e hosts attach 8 chips behind a standard
  datacenter NIC; we model 200 Gbps per host = 25 GB/s, halved to
  12.5 GB/s effective, t_hop = 10 µs. A DCN "worker" is a HOST (its 8
  chips first reduce over ICI, which the ICI rows show is ~free).

Writes SCALING_r05.json. Usage: python tools/scaling_model_r05.py
"""

from __future__ import annotations

import dataclasses
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

DTYPE_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "pred": 1}


def allreduce_bytes(compiled_text: str):
    total = 0
    ops = []
    for line in compiled_text.splitlines():
        if "= " not in line:
            continue
        rest = line.split("= ", 1)[1]
        if " all-reduce(" not in rest and " all-reduce-start(" not in rest:
            continue
        shape_part = rest.split(" all-reduce", 1)[0]
        for dt, dims in re.findall(r"(f64|f32|bf16|f16|s32|u32|pred)\[([0-9,]*)\]", shape_part):
            n_el = 1
            for d in dims.split(","):
                if d:
                    n_el *= int(d)
            total += n_el * DTYPE_BYTES[dt]
            ops.append(f"{dt}[{dims}]")
    return total, sorted(set(ops)), len(ops)


def measure_textured_payload():
    """All-reduce bytes of a DUCK-CLASS textured multiview step: texture
    atlas (and lighting-free shared params) replicated, per-view pose
    inputs and observations sharded; measured from the compiled 8-view CPU
    lowering (byte counts are platform-independent)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    import deodr_tpu
    from deodr_tpu import ColoredTriMesh, default_camera
    from deodr_tpu.ops.render import render_scene
    from deodr_tpu.ops.tiled import suggest_tiling
    from deodr_tpu.parallel.sharding import make_device_mesh
    from deodr_tpu.scene import Scene3D

    mesh_obj = ColoredTriMesh.load(os.path.join(deodr_tpu.data_path, "duck.obj"))
    rot = np.array([[1.0, 0, 0], [0, -1, 0], [0, 0, -1]])
    camera = default_camera(320, 240, 60, np.asarray(mesh_obj.vertices), rot)
    scene = Scene3D(sigma=1.0)
    scene.impl = "xla"
    scene.set_mesh(mesh_obj)
    scene.set_light(np.array([-0.4, -0.4, -0.8]), 0.4)
    scene.set_background_color(np.array([0.2, 0.3, 0.5]))
    cap, tiling, aa_window, aa_tex_window, aa_tex_plan = scene._eager_plan(camera)
    buffers, _ = scene._build_buffers(camera, *scene._diff_inputs(False), True, None)
    buffers = jax.tree.map(jnp.asarray, buffers)

    n = 8
    cpu = jax.devices("cpu")
    mesh8 = make_device_mesh(n_views=n, n_tiles=1, devices=cpu[:n])
    obs_all = jnp.zeros((n, camera.height, camera.width, 3), jnp.float32)
    ij_all = jnp.tile(buffers.ij[None], (n, 1, 1))

    def loss(texture, uv, shade, ij_all, obs_all):
        def one(ij, obs):
            b = dataclasses.replace(
                buffers, ij=ij, texture=texture, uv=uv, shade=shade
            )
            img, _, _ = render_scene(
                b, 1.0, aa_edge_capacity=cap, tiling=tiling, impl="xla",
                aa_window=aa_window, aa_tex_window=aa_tex_window,
            )
            return jnp.sum((img - obs) ** 2)

        return jnp.sum(jax.vmap(one)(ij_all, obs_all))

    repl = NamedSharding(mesh8, P())
    shard = NamedSharding(mesh8, P("views"))
    step = jax.jit(
        jax.value_and_grad(loss, argnums=(0, 1, 2)),
        in_shardings=(repl, repl, repl, shard, shard),
        out_shardings=(repl, (repl, repl, repl)),
    )
    txt = step.lower(
        buffers.texture, buffers.uv, buffers.shade, ij_all, obs_all
    ).compile().as_text()
    auto = allreduce_bytes(txt)

    # the PRODUCTION path: shard_map + explicit psum of only the final
    # shared-parameter gradients (parallel/sharding.py::
    # make_textured_multiview_step) — each device finishes its local
    # backward to the (th, tw, C) atlas gradient before the ring sees it
    from deodr_tpu.parallel.sharding import make_textured_multiview_step

    sm_step = make_textured_multiview_step(
        buffers, 1.0, mesh8, aa_edge_capacity=cap, tiling=tiling, impl="xla",
        aa_window=aa_window, aa_tex_window=aa_tex_window,
    )
    params = {"texture": buffers.texture, "uv": buffers.uv, "shade": buffers.shade}
    params = jax.device_put(params, repl)
    ij_sh = jax.device_put(ij_all, shard)
    obs_sh = jax.device_put(obs_all, shard)
    txt_sm = sm_step.step_jit.lower(params, ij_sh, obs_sh).compile().as_text()
    return auto, allreduce_bytes(txt_sm)


def ring_eff(step_s: float, b: float, bw: float, t_hop: float, ns):
    out = {}
    for n in ns:
        t_ar = 2.0 * b * (n - 1) / n / bw + 2.0 * (n - 1) * t_hop
        out[str(n)] = round(step_s / (step_s + t_ar), 4)
    return out


def main():
    import jax

    results = {}

    # payload class A: untextured multiview (reuse scaling_model.py's setup)
    import scaling_model as r04

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from deodr_tpu.parallel.sharding import make_device_mesh, _render_view

    height = width = 128
    cpu = jax.devices("cpu")
    mesh8 = make_device_mesh(n_views=8, n_tiles=1, devices=cpu[:8])
    static, params, obs, ext, intr = r04._build_inputs(8, height, width)

    def loss_fn(params, obs, ext, intr):
        per_view = jax.vmap(
            lambda q, t, e, i, o: _render_view(
                params["vertices"], q, t, params["mesh_color"],
                params["light_directional"], params["light_ambient"], e, i, o, static,
            )
        )(params["quaternion"], params["translation"], ext, intr, obs)
        return jnp.sum(per_view)

    repl = NamedSharding(mesh8, P())
    shard = NamedSharding(mesh8, P("views"))
    grad_step = jax.jit(
        jax.value_and_grad(loss_fn),
        in_shardings=(repl, shard, shard, shard),
        out_shardings=(repl, repl),
    )
    txt = grad_step.lower(params, obs, ext, intr).compile().as_text()
    b_unt, ops_unt, n_unt = allreduce_bytes(txt)
    results["untextured"] = {
        "allreduce_bytes_per_step": b_unt,
        "allreduce_ops": ops_unt,
        "scene": "512-face octahedron sphere, 128x128, sigma=1, grads wrt all shared params",
    }

    # payload class B: duck-class textured multiview (atlas grad dominates)
    (b_auto, ops_auto, n_auto), (b_tex, ops_tex, n_tex) = measure_textured_payload()
    results["textured_jit_autosharded"] = {
        "allreduce_bytes_per_step": b_auto,
        "allreduce_ops": ops_auto,
        "note": "jit auto-sharding all-reduces the (tex_h*tex_w, 4C) bilinear "
                "footprint-table cotangent BEFORE the atlas un-build — 12.6 MB "
                "of avoidable payload on top of the 3.1 MB atlas gradient. Kept "
                "as the measured motivation for the shard_map path below.",
    }
    results["textured"] = {
        "allreduce_bytes_per_step": b_tex,
        "allreduce_ops": ops_tex,
        "scene": "duck (4212 faces, 512^2x3 atlas), 320x240 views, sigma=1, "
                 "grads wrt texture+uv+shade (atlas gradient dominates the payload); "
                 "production path: parallel.sharding.make_textured_multiview_step "
                 "(shard_map + psum of ONLY the final shared-parameter grads)",
    }

    # step times on the real chip
    tpu = [d for d in jax.devices() if d.platform != "cpu"]
    platform = tpu[0].platform if tpu else "cpu"
    results["step_platform"] = platform

    # untextured: shard_map 1-dev step (as in scaling_model.py)
    mesh1 = make_device_mesh(n_views=1, n_tiles=1, devices=(tpu or cpu)[:1])
    static1, params1, obs1, ext1, intr1 = r04._build_inputs(1, height, width)
    from deodr_tpu.parallel.sharding import make_multiview_train_step

    step1 = make_multiview_train_step(static1, mesh1)
    out = step1(params1, obs1, ext1, intr1)
    jax.block_until_ready(out)
    iters = 20

    def loop(params):
        for _ in range(iters):
            params, loss = step1(params, obs1, ext1, intr1)
        return params, loss

    p, loss = loop(params1)
    jax.block_until_ready((p, loss))
    best = None
    for _ in range(3):
        t0 = time.time()
        p, loss = loop(p)
        jax.block_until_ready((p, loss))
        dt = (time.time() - t0) / iters
        best = dt if best is None else min(best, dt)
    step_unt = best
    results["untextured"]["step_ms_1dev"] = round(step_unt * 1e3, 3)

    # textured: the duck fwd+bwd iteration measured by bench.measure_duck —
    # the per-view work a textured multiview fit does on each chip
    import bench

    duck_wall_ms, duck_dev_ms = bench.measure_duck()
    step_tex = (duck_dev_ms or duck_wall_ms) / 1e3
    results["textured"]["step_ms_1dev"] = round(step_tex * 1e3, 3)

    # tiers × payloads
    ICI_BW, ICI_HOP = 100e9, 1e-6
    DCN_BW, DCN_HOP = 12.5e9, 10e-6
    ns = (2, 4, 8, 16, 64)
    results["predicted_weak_scaling_efficiency"] = {
        "untextured_ici_chips": ring_eff(step_unt, b_unt, ICI_BW, ICI_HOP, ns),
        "untextured_dcn_hosts": ring_eff(step_unt, b_unt, DCN_BW, DCN_HOP, ns),
        "textured_ici_chips": ring_eff(step_tex, b_tex, ICI_BW, ICI_HOP, ns),
        "textured_dcn_hosts": ring_eff(step_tex, b_tex, DCN_BW, DCN_HOP, ns),
    }
    results["assumptions"] = (
        "ring all-reduce: T_ar = 2*B*(N-1)/N/BW + 2*(N-1)*t_hop. ICI: BW=100 GB/s "
        "effective (v5e 4x400 Gbps aggregate, halved), t_hop=1us, N counts chips. "
        "DCN: BW=12.5 GB/s effective per host (200 Gbps NIC, halved), t_hop=10us, N "
        "counts HOSTS (each host's 8 chips pre-reduce over ICI, which the ICI rows "
        "show costs <0.1% at these payloads). B measured from compiled 8-view HLO "
        "all-reduce shapes (platform-independent); step times measured on the real "
        "chip. The textured DCN case is the stress case: a 3.1 MB atlas gradient "
        "every ~10 ms step."
    )
    # mitigation sketch if any row lands under 0.8 (the >=80% target)
    worst = min(
        v for tier in results["predicted_weak_scaling_efficiency"].values() for v in tier.values()
    )
    results["worst_case_efficiency"] = worst
    if worst < 0.8:
        results["mitigation"] = (
            "shard the atlas gradient over the ring (reduce-scatter + keep shards; "
            "optimizer runs sharded) or all-reduce the atlas every K steps with "
            "local accumulation — both cut the per-step DCN payload by N or K"
        )

    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALING_r05.json"
    )
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()

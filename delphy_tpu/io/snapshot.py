"""Run snapshots: save/resume of the complete MCMC state.

Functional counterpart of the reference's .dphy stream (core/delphy_output.
{h,cpp}, doc/dphy_file_format.md): the full EMAT (ref seq, node arrays,
mutation pool, missation tables), every model parameter and prior
hyperparameter, and the RNG key — enough to reconstruct a Run exactly
(cf. api_tree_and_tree_info_to_phylo_tree + apply_api_params_to_run,
core/api.h:18-23).  Serialization is an .npz container plus a JSON metadata
blob rather than flatbuffers."""

from __future__ import annotations

import dataclasses
import io
import json

import numpy as np
import jax.numpy as jnp

MAGIC = "delphy-tpu-snapshot"
VERSION = 3


def save_run(run, path):
    from .. import pop as popm
    # settle in-flight dispatches so the adaptive feedback state
    # (_per_block_rate, attempted counts) is final before serialization
    if hasattr(run, "_drain_inflight"):
        run._drain_inflight(block=True)
    arrays = {f"ts_{k}": np.asarray(v) for k, v in run.ts._asdict().items()}
    arrays["key"] = np.asarray(run.key)
    # driver-adaptive state (partition maps, feedback rates, capacities):
    # required for bit-identical resume — pm was built with host RNG draws
    # that cannot be replayed, so it is serialized outright
    if run.pm is not None:
        for k, v in run.pm._asdict().items():
            arrays[f"pm_{k}"] = np.asarray(v)
    for k in ("mu", "kappa", "pi", "q", "alpha", "nu", "part", "q_tab",
              "mpox_rho"):
        arrays[f"evo_{k}"] = np.asarray(getattr(run.evo, k))
    if isinstance(run.pop, popm.SkygridPopParams):
        pop_meta = {"model": "skygrid", "type": int(run.pop.type)}
        arrays["pop_x"] = np.asarray(run.pop.x)
        arrays["pop_gamma"] = np.asarray(run.pop.gamma)
        arrays["pop_tau"] = np.asarray(run.pop.tau)
    else:
        pop_meta = {"model": "exp"}
        for k in ("t0", "n0", "g", "min_pop"):
            arrays[f"pop_{k}"] = np.asarray(getattr(run.pop, k))

    meta = {
        "magic": MAGIC,
        "version": VERSION,
        "step": run.step,
        "names": run.names,
        "pop": pop_meta,
        "hyp": dataclasses.asdict(run.hyp),
        "num_cells": run.num_cells,
        "local_moves_per_global_move": run.local_moves_per_global_move,
        "topology_moves_enabled": run.topology_moves_enabled,
        "t_max_tip": run.t_max_tip,
        "host_rng_state": _rng_state_to_json(run.host_rng),
        "driver": {
            "device_partitions": run.device_partitions,
            "topology_partitions": run.topology_partitions,
            "topology_parallel_processes": run.topology_parallel_processes,
            "topology_burst_chunks": run.topology_burst_chunks,
            "mpox_hack": run.mpox_hack,
            "mut_capacity": run.mut_capacity,
            "miss_capacity": run.miss_capacity,
            "fs_capacity": run.fs_capacity,
            "n_cap_sticky": run._n_cap_sticky,
            "m_cap_sticky": run._m_cap_sticky,
            "per_block_rate": run._per_block_rate,
            "topo_debt": run._topo_debt,
            "boundaries_since_repart": run._boundaries_since_repart,
            "sweep_k_max": run._sweep_k_max,
            "sweep_reform_batch": run._sweep_reform_batch,
            "local_moves_attempted": run.local_moves_attempted,
            "topology_accepted": run.topology_accepted,
            "topology_proposed": run.topology_proposed,
        },
    }
    arrays["_meta_json"] = np.frombuffer(
        json.dumps(meta).encode("utf-8"), dtype=np.uint8)
    with open(path, "wb") as f:
        np.savez_compressed(f, **arrays)


def load_run(path):
    from ..run import Run
    from ..state import TreeState, unpack_state
    from ..evo import EvoParams
    from ..mcmc.global_moves import PriorConfig
    from .. import pop as popm

    with np.load(path) as z:
        meta = json.loads(bytes(z["_meta_json"]).decode("utf-8"))
        assert meta["magic"] == MAGIC, "not a delphy-tpu snapshot"
        assert meta["version"] <= VERSION
        data = {k: z[k] for k in z.files if k != "_meta_json"}

    ts = TreeState(**{k[3:]: jnp.asarray(v) for k, v in data.items()
                      if k.startswith("ts_")})
    tree = unpack_state(ts, names=meta["names"])
    hyp = PriorConfig(**meta["hyp"])
    drv = meta.get("driver", {})
    run = Run(tree, seed=0, hyp=hyp, num_cells=meta["num_cells"],
              local_moves_per_global_move=meta["local_moves_per_global_move"],
              topology_moves_enabled=meta["topology_moves_enabled"],
              pop_model=meta["pop"]["model"],
              **({"device_partitions": drv["device_partitions"],
                  "topology_partitions": drv["topology_partitions"],
                  "topology_parallel_processes":
                      drv["topology_parallel_processes"],
                  "mpox_hack": drv["mpox_hack"]} if drv else {}),
              **({"skygrid_num_parameters": len(data["pop_gamma"]),
                  "skygrid_type": meta["pop"]["type"]}
                 if meta["pop"]["model"] == "skygrid" else {}))
    if drv:
        # exact driver-adaptive state (v3): the packed arrays, partition maps
        # and feedback scalars as-of-save — bit-identical resume depends on
        # every one of these (they steer n_blocks, kernel shapes and the
        # repartition cadence)
        from ..parallel.partmaps import PartMaps
        run.mut_capacity = drv["mut_capacity"]
        run.miss_capacity = drv["miss_capacity"]
        run.fs_capacity = drv["fs_capacity"]
        run.ts = ts
        if any(k.startswith("pm_") for k in data):
            run.pm = PartMaps(**{k[3:]: jnp.asarray(v)
                                 for k, v in data.items()
                                 if k.startswith("pm_")})
        run.topology_burst_chunks = drv["topology_burst_chunks"]
        run._n_cap_sticky = drv["n_cap_sticky"]
        run._m_cap_sticky = drv["m_cap_sticky"]
        run._per_block_rate = drv["per_block_rate"]
        run._topo_debt = drv["topo_debt"]
        run._boundaries_since_repart = drv["boundaries_since_repart"]
        run._sweep_k_max = drv["sweep_k_max"]
        run._sweep_reform_batch = drv["sweep_reform_batch"]
        run.local_moves_attempted = drv["local_moves_attempted"]
        run.topology_accepted = drv["topology_accepted"]
        run.topology_proposed = drv["topology_proposed"]
    L = int(np.asarray(data["evo_nu"]).shape[0])
    part = (jnp.asarray(data["evo_part"]) if "evo_part" in data
            else jnp.zeros((L,), jnp.int32))
    q_tab = (jnp.asarray(data["evo_q_tab"]) if "evo_q_tab" in data
             else jnp.asarray(data["evo_q"])[None])
    rho = (jnp.asarray(data["evo_mpox_rho"]) if "evo_mpox_rho" in data
           else jnp.float64(0.0))
    run.evo = EvoParams(
        mu=jnp.asarray(data["evo_mu"]), kappa=jnp.asarray(data["evo_kappa"]),
        pi=jnp.asarray(data["evo_pi"]), q=jnp.asarray(data["evo_q"]),
        alpha=jnp.asarray(data["evo_alpha"]), nu=jnp.asarray(data["evo_nu"]),
        part=part, q_tab=q_tab, mpox_rho=rho)
    if meta["pop"]["model"] == "skygrid":
        run.pop = popm.SkygridPopParams(
            x=jnp.asarray(data["pop_x"]), gamma=jnp.asarray(data["pop_gamma"]),
            type=meta["pop"]["type"], tau=jnp.asarray(data["pop_tau"]))
    else:
        run.pop = popm.ExpPopParams(
            t0=jnp.asarray(data["pop_t0"]), n0=jnp.asarray(data["pop_n0"]),
            g=jnp.asarray(data["pop_g"]), min_pop=jnp.asarray(data["pop_min_pop"]))
    run.key = jnp.asarray(data["key"])
    run.step = meta["step"]
    run._fused_bundle = None   # ts/evo/pop replaced above
    _rng_state_from_json(run.host_rng, meta["host_rng_state"])
    return run


def _rng_state_to_json(rng: np.random.Generator):
    st = rng.bit_generator.state
    return json.loads(json.dumps(st, default=int))


def _rng_state_from_json(rng: np.random.Generator, st):
    cur = rng.bit_generator.state
    if cur["bit_generator"] == st["bit_generator"]:
        for k in ("state",):
            pass
        # numpy expects exact ints
        def fix(d):
            return {k: (fix(v) if isinstance(v, dict) else
                        int(v) if isinstance(v, (int, float)) and not isinstance(v, bool) else v)
                    for k, v in d.items()}
        rng.bit_generator.state = fix(st)

"""Command-line drivers: ``python -m deepaco_tpu {train,test} <problem> ...``.

Unifies the reference's per-problem argparse CLIs (tsp_nls/train.py:130-145,
cvrp_nls/train.py:154-169, tsp_nls/test.py:66-81, mkp/test.py, ...) behind one
entry point over the family registry.
"""
from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="deepaco_tpu")
    sub = p.add_subparsers(dest="command", required=True)

    tr = sub.add_parser("train", help="REINFORCE-train a neural heuristic")
    tr.add_argument("problem", choices=["tsp", "cvrp", "op", "pctsp",
                                        "smtwtp", "mkp", "mkp_items", "bpp",
                                        "sop", "rcpsp"])
    tr.add_argument("-n", "--nodes", type=int, default=100)
    tr.add_argument("-k", "--k-sparse", type=int, default=None)
    tr.add_argument("-a", "--ants", type=int, default=20)
    tr.add_argument("-e", "--epochs", type=int, default=5)
    tr.add_argument("-s", "--steps", type=int, default=128)
    tr.add_argument("-b", "--batch-size", type=int, default=1)
    tr.add_argument("--lr", type=float, default=3e-4)
    tr.add_argument("--weight-decay", type=float, default=None,
                    help="AdamW weight decay; default = the family's "
                         "reference value (0 for mkp, mkp/train.py:78; "
                         "torch's 1e-2 elsewhere)")
    tr.add_argument("--seed", type=int, default=0)
    tr.add_argument("-o", "--output", default=None,
                    help="checkpoint path (.msgpack)")
    tr.add_argument("--val-instances", type=int, default=0,
                    help="per-epoch validation on a held-out batch of this "
                         "size + best/last checkpoint selection "
                         "(tsp_nls/train.py:99-122)")
    tr.add_argument("--val-t", type=int, default=10,
                    help="ACO iterations for the validation sweep")
    tr.add_argument("--local-search", choices=["2opt", "nls", "swapstar"],
                    default=None,
                    help="tsp: NLS-shaped advantage with on-device 2-opt/NLS "
                         "(tsp_nls/train.py); cvrp: LS-only advantage with "
                         "the native SWAP* engine (cvrp_nls/train.py)")

    te = sub.add_parser("test", help="anytime evaluation on golden datasets")
    te.add_argument("problem", choices=["tsp", "cvrp", "op", "pctsp",
                                        "smtwtp", "mkp", "mkp_items", "bpp",
                                        "sop", "rcpsp"])
    te.add_argument("-n", "--nodes", type=int, default=100)
    te.add_argument("-k", "--k-sparse", type=int, default=None)
    te.add_argument("-a", "--ants", type=int, default=20)
    te.add_argument("-t", "--t-aco", type=int, nargs="+",
                    default=[1, 10, 20, 30, 40, 50, 100])
    te.add_argument("-c", "--ckpt", default=None,
                    help=".msgpack from train, or a reference .pt checkpoint")
    te.add_argument("--classic", action="store_true",
                    help="classic-ACO A/B baseline (no model)")
    te.add_argument("--limit", type=int, default=None,
                    help="evaluate only the first N instances")
    te.add_argument("--b-chunk", type=int, default=None,
                    help="instances per device program (watchdog safety "
                         "for big scales; default: auto)")
    te.add_argument("--seed", type=int, default=0)
    te.add_argument("--local-search", choices=["2opt", "nls", "swapstar"],
                    default=None,
                    help="tsp: on-device 2-opt/NLS in the run loop (the "
                         "tsp_nls protocol, tsp_nls/test.py:49-56); cvrp: "
                         "native SWAP* top-k refine (the cvrp_nls protocol, "
                         "cvrp_nls/test.py:80-96)")
    te.add_argument("--per-instance", action="store_true",
                    help="with --local-search: drive the reference-style "
                         "per-instance ACO facade instead of the whole-batch "
                         "device program")
    te.add_argument("--backfill", action="store_true",
                    help="rcpsp: decode with the gap-filling SSGS variant "
                         "(shorter schedules than the reference's "
                         "append-only decoder; see aco/problems/rcpsp.py)")
    te.add_argument("--sparse", action="store_true",
                    help="TSP only: the large-N O(N*K) path (aco/large_tsp) "
                         "— [N,K] pheromone/scores, coordinate costs, no "
                         "[N,N] matrix anywhere; supports n beyond the "
                         "reference's 1000 (fixed-seed uniform instances are "
                         "generated where no reference dataset exists)")

    sv = sub.add_parser(
        "solve-cvrp",
        help="standalone hybrid genetic search on a CVRPLib .vrp file "
             "(the reference's HGS binary, HGS-CVRP-main/Program/main.cpp)")
    sv.add_argument("instance", help="CVRPLib .vrp file")
    sv.add_argument("--max-iters", type=int, default=5000)
    sv.add_argument("--no-improve", type=int, default=1000)
    sv.add_argument("--time-limit", type=float, default=0.0,
                    help="seconds; 0 disables")
    sv.add_argument("--seed", type=int, default=0)
    sv.add_argument("--round", action="store_true",
                    help="round distances to integers (CVRPLib convention)")
    return p


def cmd_train(args) -> None:
    from deepaco_tpu.train.config import (ACOSettings, ProblemConfig,
                                          TrainConfig)
    from deepaco_tpu.train.drivers import train_family
    from deepaco_tpu.utils.checkpoint import save_checkpoint

    if getattr(args, "local_search", None):
        return _cmd_train_ls(args)
    if args.problem == "rcpsp":
        return _cmd_train_rcpsp(args)
    k = args.k_sparse or max(args.nodes // 10, 3)
    wd = args.weight_decay
    if wd is None:
        # the reference's only per-family optimizer quirk: the GNN MKP
        # trainer sets weight_decay=0 (mkp/train.py:78); every other driver
        # (incl. mkp_transformer/train.py:79) uses torch's AdamW default 1e-2
        wd = 0.0 if args.problem == "mkp" else 1e-2
    cfg = ProblemConfig(
        name=args.problem, n_nodes=args.nodes, k_sparse=k,
        aco=ACOSettings(n_ants=args.ants),
        train=TrainConfig(lr=args.lr, weight_decay=wd, epochs=args.epochs,
                          steps_per_epoch=args.steps,
                          batch_size=args.batch_size, seed=args.seed))
    t0 = time.time()
    out = args.output or f"checkpoints/{args.problem}{args.nodes}.msgpack"

    def prog(ep, c, val=None):
        extra = "" if val is None else f", val best@T={args.val_t} {val:.4f}"
        print(f"epoch {ep}: mean cost {c:.4f}{extra} "
              f"({time.time() - t0:.1f}s)", flush=True)

    state = train_family(args.problem, cfg, progress=prog,
                         val_instances=args.val_instances, val_t=args.val_t,
                         ckpt_path=out if args.val_instances else None)
    save_checkpoint(out, state)
    print(f"saved {out}")


def _cmd_train_ls(args) -> None:
    """NLS training CLIs (reference tsp_nls/train.py and cvrp_nls/train.py)."""
    from deepaco_tpu.train.config import (ACOSettings, ProblemConfig,
                                          TrainConfig)
    from deepaco_tpu.utils.checkpoint import save_checkpoint

    t0 = time.time()
    prog = lambda ep, c: print(f"epoch {ep}: mean cost {c:.4f} "
                               f"({time.time() - t0:.1f}s)", flush=True)
    if args.problem == "tsp":
        assert args.local_search in ("2opt", "nls")
        from deepaco_tpu.models.gnn import Net
        from deepaco_tpu.train.reinforce import nls_local_search, train_tsp

        cfg = ProblemConfig(
            name="tsp_nls", n_nodes=args.nodes,
            k_sparse=args.k_sparse or max(args.nodes // 10, 3),
            aco=ACOSettings(n_ants=args.ants),
            train=TrainConfig(lr=args.lr, epochs=args.epochs,
                              steps_per_epoch=args.steps,
                              batch_size=args.batch_size, seed=args.seed))
        # --local-search 2opt == NLS with zero perturbation rounds
        ls = nls_local_search() if args.local_search == "nls" \
            else nls_local_search(t_nls=0)
        state = train_tsp(Net(), cfg, local_search=ls, progress=prog)
        out = args.output or f"checkpoints/tsp_nls{args.nodes}.msgpack"
    elif args.problem == "cvrp":
        assert args.local_search == "swapstar", \
            "cvrp training uses --local-search swapstar"
        from deepaco_tpu.train.special import train_cvrp_nls

        _, state = train_cvrp_nls(
            args.nodes, epochs=args.epochs, steps_per_epoch=args.steps,
            lr=args.lr, n_ants=args.ants,
            k_sparse=args.k_sparse or 5, seed=args.seed, progress=prog)
        out = args.output or f"checkpoints/cvrp_nls{args.nodes}.msgpack"
    else:
        raise SystemExit("--local-search training applies to tsp/cvrp")
    save_checkpoint(out, state)
    print(f"saved {out}")


#: Root of the reference checkout for default pretrained checkpoints;
#: override with DEEPACO_REFERENCE_ROOT on machines without it.
REFERENCE_ROOT = os.environ.get("DEEPACO_REFERENCE_ROOT", "/root/reference")


def _cmd_train_rcpsp(args) -> None:
    """RCPSP training (reference rcpsp/train.ipynb): PSPLIB train split of
    j{n}rcp, 1/n-scaled REINFORCE with grad-clip 1.0."""
    from deepaco_tpu.core.rcpsp import load_psplib
    from deepaco_tpu.train.special import train_rcpsp
    from deepaco_tpu.utils.checkpoint import save_checkpoint

    archive = f"{REFERENCE_ROOT}/data/rcpsp/psplib.tar.gz"
    insts = load_psplib(archive, f"j{args.nodes}rcp", split="train")
    horizon = max(d.t_max for d in insts)   # one jit bucket for the subset
    insts = [d._replace(t_max=horizon) for d in insts]
    t0 = time.time()
    _, state = train_rcpsp(
        insts, epochs=args.epochs, steps_per_epoch=args.steps,
        n_ants=args.ants, lr=args.lr, seed=args.seed,
        progress=lambda ep, c: print(f"epoch {ep}: mean makespan {c:.2f} "
                                     f"({time.time() - t0:.1f}s)", flush=True))
    out = args.output or f"checkpoints/rcpsp{args.nodes}.msgpack"
    save_checkpoint(out, state)
    print(f"saved {out}")


def _cmd_test_rcpsp(args) -> None:
    """RCPSP anytime protocol (rcpsp/test.ipynb cells 0-5): 100-instance
    PSPLIB test split, elitist + MAX-MIN, neural or classic heuristic."""
    from deepaco_tpu.core.rcpsp import load_psplib
    from deepaco_tpu.eval.rcpsp import evaluate_rcpsp

    archive = f"{REFERENCE_ROOT}/data/rcpsp/psplib.tar.gz"
    insts = load_psplib(archive, f"j{args.nodes}rcp", split="test",
                        limit=args.limit)
    variables = None
    if not args.classic:
        if args.ckpt is None:
            args.ckpt = _default_ckpt("rcpsp", args.nodes)
        if args.ckpt.endswith(".pt"):
            from deepaco_tpu.models.torch_compat import \
                load_reference_checkpoint

            variables = load_reference_checkpoint(args.ckpt)
        else:
            import jax

            from deepaco_tpu.models.gnn import Net
            from deepaco_tpu.train.reinforce import TrainState
            from deepaco_tpu.train.special import rcpsp_graph_arrays, _block
            from deepaco_tpu.utils.checkpoint import load_checkpoint
            import optax

            model = Net(pad_feats=5)
            g0 = rcpsp_graph_arrays(insts[0])
            tmpl_vars = model.init(jax.random.PRNGKey(0),
                                   (g0[0], (_block(*g0[1:]),)), train=False)
            # must mirror train_rcpsp's optimizer chain so the serialized
            # opt_state pytree matches (clip + adamw, train/special.py:88)
            tx = optax.chain(optax.clip_by_global_norm(1.0),
                             optax.adamw(1e-3))
            template = TrainState(tmpl_vars["params"],
                                  tmpl_vars.get("batch_stats", {}),
                                  tx.init(tmpl_vars["params"]), 0)
            state = load_checkpoint(args.ckpt, template)
            variables = {"params": state.params,
                         "batch_stats": state.batch_stats}
    t0 = time.time()
    means, _ = evaluate_rcpsp(insts, variables, n_ants=args.ants,
                              t_values=tuple(args.t_aco), seed=args.seed,
                              b_chunk=args.b_chunk or 25,
                              backfill=getattr(args, "backfill", False))
    duration = time.time() - t0
    print(f"total duration: {duration:.2f}s")
    for t, v in zip(args.t_aco, np.asarray(means)):
        print(f"T={t}, average cost is {v:.6f}.")
    print(json.dumps({"problem": "rcpsp", "n": args.nodes,
                      "instances": len(insts), "t_aco": args.t_aco,
                      "means": [float(v) for v in np.asarray(means)],
                      "backfill": bool(getattr(args, "backfill", False)),
                      "duration_s": duration}))


def _cmd_test_tsp_sparse(args) -> None:
    """Large-N sparse-state TSP protocol (aco/large_tsp.py).

    For n with a reference golden set (<=1000) the instances are the golden
    coords; beyond that, fixed-seed uniform instances (documented extension —
    the reference has no data or engine at these scales)."""
    import jax
    import jax.numpy as jnp

    from deepaco_tpu.aco.large_tsp import (classic_knn_heuristic, knn_support,
                                           run_anytime_knn, sparse_tsp_graph)
    from deepaco_tpu.aco.runner import ACOConfig
    from deepaco_tpu.utils import golden

    n = args.nodes
    k = args.k_sparse or max(n // 10, 3)
    if n <= 1000:
        coords_all = golden.GOLDEN["tsp"](n)["coords"]
    else:
        rng = np.random.default_rng(123456)
        count = args.limit or 30
        coords_all = rng.random((count, n, 2)).astype(np.float32)
    if args.limit:
        coords_all = coords_all[:args.limit]

    variables = None
    if not args.classic:
        if args.ckpt is None:
            for cand_n in (n, 500, 100):   # largest available tsp checkpoint
                cand = f"{REFERENCE_ROOT}/pretrained/tsp/tsp{cand_n}.pt"
                if os.path.exists(cand):
                    args.ckpt = cand
                    break
        variables = _load_variables(args)
    if variables is not None:
        from deepaco_tpu.models.gnn import Net

        model = Net(dual_heads=True)

        @jax.jit
        def heu_fn(coords, nbr):
            g = sparse_tsp_graph(coords, nbr)
            _, heu = model.apply(variables, g, train=False)
            return heu + 1e-10

    cfg = ACOConfig(n_ants=args.ants)
    ls = args.local_search
    t_values = args.t_aco
    t_max = max(t_values)
    curves = []
    t0 = time.time()
    for i in range(coords_all.shape[0]):
        coords = jnp.asarray(coords_all[i])
        nbr = knn_support(coords, k)
        heu = heu_fn(coords, nbr) if variables is not None \
            else classic_knn_heuristic(coords, nbr)
        curve, _ = run_anytime_knn(coords, nbr, heu, cfg, t_max, ls,
                                   jax.random.fold_in(
                                       jax.random.PRNGKey(args.seed), i))
        curves.append(np.asarray(curve))
    curves = np.stack(curves)
    means = curves[:, [t - 1 for t in t_values]].mean(axis=0)
    duration = time.time() - t0
    print(f"total duration: {duration:.2f}s")
    for t, v in zip(t_values, means):
        print(f"T={t}, average cost is {v:.6f}.")
    print(json.dumps({"problem": "tsp_sparse", "n": n,
                      "instances": int(coords_all.shape[0]),
                      "t_aco": t_values, "means": means.tolist(),
                      "duration_s": duration}))


def _cmd_test_cvrp_ls(args) -> None:
    """CVRP-NLS anytime protocol (cvrp_nls/test.py:80-96): pretrained
    heuristic, CVRPNLSACO with native SWAP* top-k refine in the run loop;
    every final solution route-validated."""
    import jax
    import jax.numpy as jnp

    from deepaco_tpu.aco.problems.cvrp import validate_routes
    from deepaco_tpu.aco.problems.cvrp_nls import CVRPNLSACO
    from deepaco_tpu.core.builders import cvrp_nls_graph
    from deepaco_tpu.models.gnn import Net
    from deepaco_tpu.models.torch_compat import load_reference_checkpoint
    from deepaco_tpu.utils import golden

    n = args.nodes
    k = args.k_sparse or 5   # customer-kNN width (cvrp_nls/utils.py:35)
    ds = golden.GOLDEN["cvrp_nls"](n)
    b = ds["coords"].shape[0] if not args.limit \
        else min(args.limit, ds["coords"].shape[0])
    if args.ckpt is None:
        # the reference ships cvrp100/cvrp500 only; its big-scale protocol
        # reuses the largest checkpoint (cvrp_nls/test.py takes -m explicitly)
        for cand_n in (n, 500, 100):
            cand = f"{REFERENCE_ROOT}/pretrained/cvrp_nls/cvrp{cand_n}.pt"
            if os.path.exists(cand):
                args.ckpt = cand
                break
        else:
            raise SystemExit("no cvrp_nls checkpoint found; pass --ckpt")
    if args.ckpt.endswith(".pt"):
        variables = load_reference_checkpoint(args.ckpt)
    else:
        # self-trained msgpack: rebuild the train_cvrp_nls TrainState template
        # (train/special.py) and restore params + batch stats from it
        import optax

        from deepaco_tpu.train.reinforce import TrainState
        from deepaco_tpu.utils.checkpoint import load_checkpoint

        tmpl_model = Net()
        dist0 = jnp.asarray(ds["dist"][0], jnp.float32)
        demand0 = jnp.asarray(ds["demand"][0], jnp.float32)
        g0 = cvrp_nls_graph(demand0, dist0, k=k)
        variables0 = tmpl_model.init(jax.random.PRNGKey(0), g0, train=False)
        tx = optax.chain(optax.clip_by_global_norm(3.0), optax.adamw(1e-4))
        template = TrainState(params=variables0["params"],
                              batch_stats=variables0.get("batch_stats", {}),
                              opt_state=tx.init(variables0["params"]),
                              step=jnp.zeros((), jnp.int32))
        state = load_checkpoint(args.ckpt, template)
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
    model = Net()

    @jax.jit
    def heu_fn(dist, demand):
        g = cvrp_nls_graph(demand, dist, k=k)
        out = model.apply(variables, g, train=False)
        outs = out[1] if isinstance(out, tuple) else out
        _, blocks = g
        nn = dist.shape[0]
        heu = jnp.zeros((nn, nn))
        for blk, h in zip(blocks, outs):
            src = jnp.arange(nn) if blk.src is None else blk.src
            rows = jnp.broadcast_to(src[:, None], blk.nbr.shape)
            heu = heu.at[rows, blk.nbr].set(h)
        return heu + 1e-10

    ts = args.t_aco
    curves = []
    t0 = time.time()
    for i in range(b):
        ti = time.time()
        dist = jnp.asarray(ds["dist"][i], jnp.float32)
        demand = jnp.asarray(ds["demand"][i], jnp.float32)
        heu = heu_fn(dist, demand)
        aco = CVRPNLSACO(dist, demand, capacity=1.0, n_ants=args.ants,
                         heuristic=heu, seed=args.seed + i)
        curve, done = [], 0
        for t in ts:
            aco.run(t - done)
            done = t
            curve.append(float(aco.lowest_cost))
        best = jnp.asarray(aco.state.best_path)[:, None]
        assert bool(validate_routes(best, demand, 1.0)[0]), \
            f"instance {i}: invalid best solution"
        curves.append(curve)
        print(f"inst {i}: {time.time() - ti:.1f}s", flush=True)
    means = np.mean(np.asarray(curves), axis=0)
    duration = time.time() - t0
    print(f"total duration: {duration:.2f}s")
    for t, v in zip(ts, means):
        print(f"T={t}, average cost is {v:.6f}.")
    print(json.dumps({"problem": "cvrp_nls", "n": n, "instances": b,
                      "t_aco": ts, "means": means.tolist(),
                      "duration_s": duration}))


def _default_ckpt(problem: str, nodes: int) -> str:
    """Mirror the reference test drivers' default: the pretrained torch
    checkpoint for (problem, scale) (tsp_nls/test.py:75, cvrp/test.py)."""
    # reference checkpoint layouts that don't follow <problem>/<problem><n>.pt
    special = {"mkp_items": f"mkp_transformer/mkp{nodes}.pt",
               "rcpsp": f"rcpsp/rcpsp{nodes}-5.pt"}
    cands = [f"{REFERENCE_ROOT}/pretrained/"
             + special.get(problem, f"{problem}/{problem}{nodes}.pt"),
             f"checkpoints/{problem}{nodes}.msgpack"]
    for c in cands:
        if os.path.exists(c):
            return c
    raise SystemExit(
        f"no checkpoint for {problem}{nodes}: pass --ckpt, --classic, or "
        f"train one (looked at {cands})")


def _load_variables(args):
    from deepaco_tpu.families import get_family
    from deepaco_tpu.train.config import ACOSettings, ProblemConfig, TrainConfig
    from deepaco_tpu.train.drivers import family_model, init_family_state
    from deepaco_tpu.utils.checkpoint import load_checkpoint

    if args.ckpt is None:
        args.ckpt = _default_ckpt(args.problem, args.nodes)
    if args.ckpt.endswith(".pt"):
        from deepaco_tpu.models.torch_compat import load_reference_checkpoint

        return load_reference_checkpoint(args.ckpt)
    if getattr(args, "local_search", None) and args.problem == "tsp":
        # NLS checkpoints are trained on the start-node one-hot graph
        # (1 node feature) — the tsp family template has 2
        import jax

        from deepaco_tpu.models.gnn import Net
        from deepaco_tpu.train.reinforce import init_train_state

        # checkpoints trained with the reference's cosine LR schedule carry
        # an extra schedule count in opt_state — try both template shapes
        state = None
        for cosine in (False, True):
            cfg = ProblemConfig(
                n_nodes=args.nodes,
                k_sparse=args.k_sparse or max(args.nodes // 10, 3),
                aco=ACOSettings(),
                train=TrainConfig(cosine_schedule=cosine))
            template = init_train_state(Net(), cfg, jax.random.PRNGKey(0),
                                        nls_graph=True)
            try:
                state = load_checkpoint(args.ckpt, template)
                break
            except ValueError:
                continue
        if state is None:
            raise SystemExit(f"cannot restore {args.ckpt}: opt_state "
                             "does not match either optimizer template")
        return {"params": state.params, "batch_stats": state.batch_stats}
    family = get_family(args.problem)
    cfg = ProblemConfig(n_nodes=args.nodes,
                        k_sparse=args.k_sparse or max(args.nodes // 10, 3),
                        aco=ACOSettings(), train=TrainConfig())
    template = init_family_state(family, family_model(family), cfg,
                                 np.random.default_rng(0))
    state = load_checkpoint(args.ckpt, template)
    return {"params": state.params, "batch_stats": state.batch_stats}


def cmd_test(args) -> None:
    import jax

    from deepaco_tpu.train.drivers import evaluate_family
    from deepaco_tpu.utils import golden

    if jax.default_backend() == "tpu":
        # hardware RNG beats threefry ~10% on the construction sweep;
        # sampling distribution is unchanged in law
        jax.config.update("jax_default_prng_impl", "rbg")

    if args.problem == "rcpsp":
        return _cmd_test_rcpsp(args)
    if getattr(args, "sparse", False):
        assert args.problem == "tsp", "--sparse applies to tsp"
        return _cmd_test_tsp_sparse(args)
    if getattr(args, "local_search", None) and args.problem == "cvrp":
        # dispatch BEFORE loading golden data: the NLS pipeline has its own
        # dataset family (cvrp_nls scales go to 1000/2000 where the vanilla
        # cvrp golden writer stops at 500)
        assert args.local_search == "swapstar", \
            "cvrp local search is the native SWAP* engine"
        return _cmd_test_cvrp_ls(args)
    ds = golden.GOLDEN[args.problem](args.nodes)
    if args.limit:
        ds = {k: v[:args.limit] for k, v in ds.items()}
    if getattr(args, "local_search", None):
        assert args.problem == "tsp", "--local-search applies to tsp/cvrp"
        return _cmd_test_tsp_ls(args, ds)
    variables = None if args.classic else _load_variables(args)
    t0 = time.time()
    means, _ = evaluate_family(
        args.problem, ds, n_nodes=args.nodes, variables=variables,
        k_sparse=args.k_sparse, n_ants=args.ants,
        t_values=tuple(args.t_aco), seed=args.seed, b_chunk=args.b_chunk)
    duration = time.time() - t0
    print(f"total duration: {duration:.2f}s")
    for t, v in zip(args.t_aco, np.asarray(means)):
        print(f"T={t}, average cost is {v:.6f}.")
    print(json.dumps({"problem": args.problem, "n": args.nodes,
                      "t_aco": args.t_aco,
                      "means": [float(v) for v in np.asarray(means)],
                      "duration_s": duration}))


def _cmd_test_tsp_ls(args, ds) -> None:
    """TSP-NLS protocol (reference tsp_nls/test.py:17-56).

    Default: the whole-batch device program (one jitted scan over the full
    instance set with the Pallas whole-descent LS on every ant).
    ``--per-instance``: the reference-style ACO facade loop."""
    import jax.numpy as jnp

    from deepaco_tpu.aco import ACO
    from deepaco_tpu.core.graph import knn_graph, scatter_to_dense
    from deepaco_tpu.models.gnn import Net
    from deepaco_tpu.train.drivers import family_model  # noqa: F401

    if args.ckpt is None and not args.classic:
        # the LS protocol uses the start-node-feature net — default to the
        # tsp_nls pretrained weights, not tsp's 2-feat ones (the reference
        # stores them as pretrained/tsp_nls/tsp<n>.pt, tsp_nls/test.py:75)
        cand = f"{REFERENCE_ROOT}/pretrained/tsp_nls/tsp{args.nodes}.pt"
        if os.path.exists(cand):
            args.ckpt = cand
        else:
            args.ckpt = _default_ckpt("tsp_nls", args.nodes)
    variables = None if args.classic else _load_variables(args)
    model = Net() if variables is not None else None
    k = args.k_sparse or max(args.nodes // 10, 3)
    t_values = args.t_aco
    t_max = max(t_values)

    if not args.per_instance:
        from deepaco_tpu.aco.runner import ACOConfig
        from deepaco_tpu.eval.anytime import evaluate_tsp

        t0 = time.time()
        means, _ = evaluate_tsp(
            jnp.asarray(ds["coords"], jnp.float32), model=model,
            variables=variables, k_sparse=k,
            cfg=ACOConfig(n_ants=args.ants), t_values=tuple(t_values),
            seed=args.seed, ls=args.local_search)
        means = np.asarray(means)
        duration = time.time() - t0
        print(f"total duration: {duration:.2f}s")
        for t, v in zip(t_values, means):
            print(f"T={t}, average cost is {v:.6f}.")
        print(json.dumps({"problem": "tsp_" + args.local_search,
                          "n": args.nodes, "t_aco": t_values,
                          "means": means.tolist(),
                          "duration_s": duration}))
        return

    if model is not None:
        import jax

        from deepaco_tpu.core.builders import tsp_nls_graph

        # one jitted graph-build + GNN forward reused across instances:
        # unjitted module application dispatches hundreds of ops through the
        # device relay (~50 ms each) and dominates the whole sweep
        @jax.jit
        def _heu_fn(coords, dist):
            g = tsp_nls_graph(coords, dist, k, start_node=0)
            out = model.apply(variables, g, train=False)
            heu_vec = out[1] if isinstance(out, tuple) else out
            return scatter_to_dense(g, heu_vec) + 1e-10

    curves = []
    t0 = time.time()
    for i in range(ds["coords"].shape[0]):
        coords = jnp.asarray(ds["coords"][i])
        dist = jnp.asarray(ds["dist"][i])
        if model is not None:
            heu = _heu_fn(coords, dist)
            aco = ACO(dist, n_ants=args.ants, heuristic=heu,
                      local_search=args.local_search, seed=args.seed + i,
                      coords=coords)
        else:
            aco = ACO(dist, n_ants=args.ants,
                      local_search=args.local_search, seed=args.seed + i,
                      coords=coords)
            aco.sparsify(k)
        curve, done = [], 0
        for t in t_values:
            aco.run(t - done)
            done = t
            curve.append(float(aco.lowest_cost))
        curves.append(curve)
    means = np.mean(np.asarray(curves), axis=0)
    duration = time.time() - t0
    print(f"total duration: {duration:.2f}s")
    for t, v in zip(t_values, means):
        print(f"T={t}, average cost is {v:.6f}.")
    print(json.dumps({"problem": "tsp_" + args.local_search, "n": args.nodes,
                      "t_aco": t_values, "means": means.tolist(),
                      "duration_s": duration}))


def cmd_solve_cvrp(args) -> None:
    """Solve one CVRPLib instance with the native HGS tier and print the
    solution in CVRPLib format ("Route #i: ..." + "Cost ..."), matching the
    reference binary's exportCVRPLibFormat output (Individual.cpp)."""
    from deepaco_tpu.ls.hgs import solve_cvrp
    from deepaco_tpu.utils.convert import parse_cvrplib

    with open(args.instance) as f:
        inst = parse_cvrplib(f.read())
    coords = inst["coords"]
    dist = np.linalg.norm(coords[:, None] - coords[None], axis=-1)
    if args.round:
        dist = np.round(dist)
    t0 = time.time()
    routes, cost = solve_cvrp(
        inst["demands"], dist, capacity=inst["capacity"],
        max_iters=args.max_iters, no_improve_limit=args.no_improve,
        time_limit_s=args.time_limit, seed=args.seed)
    duration = time.time() - t0
    for i, r in enumerate(routes):
        print(f"Route #{i + 1}: " + " ".join(str(int(c)) for c in r))
    print(f"Cost {cost:.2f}")
    print(f"Time {duration:.2f}")


def main(argv=None) -> None:
    from deepaco_tpu.utils.compcache import enable as _enable_cache

    _enable_cache()
    args = build_parser().parse_args(argv)
    if args.command == "train":
        cmd_train(args)
    elif args.command == "solve-cvrp":
        cmd_solve_cvrp(args)
    else:
        cmd_test(args)


if __name__ == "__main__":
    main()

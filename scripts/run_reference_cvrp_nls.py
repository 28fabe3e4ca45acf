"""Run the REFERENCE cvrp_nls protocol (cvrp_nls/test.py:80-96) end to end.

Anchors our cvrp_nls matrix cells (VERDICT r3 missing #4): the reference's
own torch engine + its prebuilt libhgscvrp.so SWAP*, on the same golden test
set, reference pretrained checkpoint, T=1..10, 20 ants, CPU.

torch_geometric is not installed here; a minimal functional stub provides
the three symbols the reference nets use (Data, BatchNorm,
global_mean_pool-as-scatter-mean). Usage:
    python scripts/run_reference_cvrp_nls.py [n_nodes] [limit]
"""
import os
import sys
import time
import types

import numpy as np
import torch

np.Infinity = np.inf          # reference code predates numpy 2.0


def install_pyg_stub():
    if "torch_geometric" in sys.modules:
        return

    class Data:
        def __init__(self, x=None, edge_index=None, edge_attr=None, **kw):
            self.x = x
            self.edge_index = edge_index
            self.edge_attr = edge_attr
            for k, v in kw.items():
                setattr(self, k, v)

        def to(self, device):
            return self

    def global_mean_pool(x, index, size=None):
        """Scatter-mean over ``index`` (how the reference uses it,
        tsp/net.py:43): out[i] = mean of x rows with index == i."""
        size = int(index.max().item()) + 1 if size is None else size
        out = torch.zeros((size, x.shape[-1]), dtype=x.dtype)
        out.index_add_(0, index, x)
        cnt = torch.zeros((size,), dtype=x.dtype).index_add_(
            0, index, torch.ones(index.shape[0], dtype=x.dtype))
        return out / cnt.clamp(min=1.0).unsqueeze(-1)

    class BatchNorm(torch.nn.Module):
        """PyG BatchNorm stores the BatchNorm1d as ``self.module`` — the
        reference checkpoints carry ``...v_bns.N.module.weight`` keys."""

        def __init__(self, in_channels, **kw):
            super().__init__()
            self.module = torch.nn.BatchNorm1d(in_channels, **kw)

        def forward(self, x):
            return self.module(x)

    tg = types.ModuleType("torch_geometric")
    tg_data = types.ModuleType("torch_geometric.data")
    tg_nn = types.ModuleType("torch_geometric.nn")
    tg_data.Data = Data
    tg_nn.BatchNorm = BatchNorm
    tg_nn.global_mean_pool = global_mean_pool
    tg.data = tg_data
    tg.nn = tg_nn
    sys.modules["torch_geometric"] = tg
    sys.modules["torch_geometric.data"] = tg_data
    sys.modules["torch_geometric.nn"] = tg_nn


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    limit = int(sys.argv[2]) if len(sys.argv) > 2 else None
    install_pyg_stub()
    ref = "/root/reference/cvrp_nls"
    os.chdir(ref)                 # swapstar.py loads its .so relative to cwd
    sys.path.insert(0, ref)
    import test as ref_test       # noqa: E402  (the reference driver)

    import utils as ref_utils     # noqa: E402

    # the repo ships no cvrp_nls datasets; regenerate the golden test set
    # with the reference's own writer code path (utils.py:89-100: fixed seed
    # 123456, 100 instances) — identical torch RNG stream, identical data
    count = limit or 100
    torch.manual_seed(123456)
    raw = []
    for _ in range(100):
        demand, dist, position = ref_utils.gen_instance(n, "cpu", True)
        raw.append(torch.vstack([demand, position.T, dist]))
    dataset = torch.stack(raw)[:count]
    k_sparse = n // 10
    test_list = []
    for i in range(len(dataset)):
        demands = dataset[i, 0, :]
        position = dataset[i, 1:3, :]
        distances = dataset[i, 3:, :]
        pyg = ref_utils.gen_pyg_data(demands, distances, "cpu",
                                     k_sparse=max(n // 5, 4))
        test_list.append((pyg, demands, distances, position.T))

    torch.manual_seed(1234)       # the test driver's seed (test.py:11)
    model = ref_test.Net().to("cpu")
    model.load_state_dict(torch.load(
        f"/root/reference/pretrained/cvrp_nls/cvrp{n}.pt",
        map_location="cpu"))
    t_aco = list(range(1, 11))
    print(f"reference cvrp_nls{n}: {len(test_list)} instances, "
          f"t_aco={t_aco}", flush=True)
    t0 = time.time()
    means, duration = ref_test.test(test_list, model, 20, t_aco, k_sparse)
    print("total duration:", duration, flush=True)
    import json

    print(json.dumps({
        "problem": f"reference_cvrp_nls{n}",
        "instances": len(test_list),
        "t_aco": t_aco,
        "means": [float(v) for v in means],
        "duration_s": time.time() - t0,
    }))


if __name__ == "__main__":
    main()

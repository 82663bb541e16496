"""MessagePassing shim: just enough for GraphConv's __init__/MLP path."""

import torch.nn


class MessagePassing(torch.nn.Module):
    def __init__(self, aggr: str | None = None, **kwargs):
        super().__init__()
        self.aggr = aggr

    def propagate(self, edge_index, **kwargs):  # pragma: no cover
        raise NotImplementedError(
            "refcompat MessagePassing.propagate: the reference rerun only "
            "exercises the MLP path (edge_index=None); install real "
            "torch_geometric for message passing"
        )

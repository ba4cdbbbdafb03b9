"""Graph block partitioning for blockwise finetuning
(redesign of ppq/quantization/algorithm/training.py:191-316 BlockBuilder /
TrainableBlock).

A TrainableBlock is a contiguous topological span of ops, treated as one
finetuning unit: cache its quantized inputs and fp32 reference outputs, then
optimize weights/scales inside the block only. On TPU each block compiles to
a single jitted fwd+bwd program (executor/compile.py op_span mode), so the
hot loop is one XLA call per step — the analogue of the reference's
partial_graph_forward (executor/torch.py:654) without interpreter overhead.

The partitioner walks the topo order greedily, closing a block when it holds
`block_size` computing ops AND the block boundary is clean (no op outside
the block consumes an intermediate produced inside, other than at the
block's declared outputs — always true for contiguous spans, so the only
real constraint is the computing-op budget; the reference's depth-limited
dominator-span search serves the same purpose).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

from ...core import COMPUTING_OP
from ...ir import BaseGraph, Operation, QuantableOperation


class TrainableBlock:
    """(reference: algorithm/training.py:172 TrainableBlock(sp, ep, rps))"""

    def __init__(self, ops: List[Operation], graph: BaseGraph):
        assert ops, 'empty block'
        self.rps = list(ops)
        self.sp = ops[0]
        self.ep = ops[-1]
        produced = {v.name for op in ops for v in op.outputs}
        self.input_names = sorted({
            v.name for op in ops for v in op.inputs
            if not v.is_parameter and v.name not in produced})
        in_block = set(id(op) for op in ops)
        self.output_names = sorted({
            v.name for op in ops for v in op.outputs
            if v.name in graph.outputs or
            any(id(d) not in in_block for d in v.dest_ops)})

    @property
    def num_computing_ops(self) -> int:
        return sum(1 for op in self.rps if op.type in COMPUTING_OP)

    def has_trainable_op(self) -> bool:
        return any(isinstance(op, QuantableOperation) for op in self.rps)

    def __repr__(self):
        return (f'TrainableBlock({self.sp.name} → {self.ep.name}, '
                f'{len(self.rps)} ops, {self.num_computing_ops} computing)')


class BlockBuilder:
    """(reference: algorithm/training.py:191)"""

    def __init__(self, graph: BaseGraph):
        self.graph = graph
        self._order = graph.topological_sort()

    def build(self, block_size: int = 4,
              only_quantable: bool = True) -> List[TrainableBlock]:
        """Partition the whole graph into blocks of ≤ block_size computing
        ops each."""
        blocks: List[TrainableBlock] = []
        current: List[Operation] = []
        n_computing = 0
        for op in self._order:
            is_comp = op.type in COMPUTING_OP
            if is_comp and n_computing >= block_size and current:
                blocks.append(TrainableBlock(current, self.graph))
                current, n_computing = [], 0
            current.append(op)
            if is_comp:
                n_computing += 1
        if current:
            blocks.append(TrainableBlock(current, self.graph))
        if only_quantable:
            blocks = [b for b in blocks if b.has_trainable_op()]
        return blocks

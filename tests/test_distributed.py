"""Multi-process (DCN-axis) execution proof.

The reference is single-process/single-GPU (SURVEY.md §2: "no multi-node
anything"); the hybrid (batch over hosts, tile in-host) mesh is this
build's new axis.  This test actually runs it: two OS processes, 4 virtual
CPU devices each, glued by ``jax.distributed`` — ``make_hybrid_mesh`` +
``ShardedPipeline`` execute with ``jax.process_count() == 2`` and every
process's output shards bit-match the single-chip reference.

Runnable standalone (writes benchmarks/distributed_smoke.json):
    python tests/distributed_worker.py --launch
"""

from .distributed_worker import launch


def test_two_process_hybrid_mesh_pipeline():
    outputs = launch(num_processes=2)
    assert len(outputs) == 2
    for info in outputs:
        assert info["process_count"] == 2
        assert info["global_devices"] == 8
        assert info["local_devices"] == 4
        assert info["mesh"] == {"batch": 2, "tile": 4}
        assert info["shards_checked"] > 0
    assert {o["process_id"] for o in outputs} == {0, 1}

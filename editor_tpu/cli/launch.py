"""Elastic launcher — the torchrun equivalent.

reference: distributed/run.py:328-696 (torchrun CLI), launcher/api.py:28-95
(LaunchConfig/elastic_launch), legacy launch.py. Spawns N worker processes
with torch-style env (RANK/LOCAL_RANK/WORLD_SIZE/MASTER_ADDR/MASTER_PORT —
consumed by editor_tpu.parallel.multihost.initialize) under the elastic
supervisor (bounded restarts, watchdog, error files).

Usage:
    python -m editor_tpu.cli.launch --nproc_per_node 2 --max_restarts 3 \
        -- python -m editor_tpu.cli.train --config_file configs/RGBNT201.yaml
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv=None):
    parser = argparse.ArgumentParser(description="editor_tpu elastic launcher")
    parser.add_argument("--nproc_per_node", type=int,
                        default=int(os.environ.get("NPROC_PER_NODE", "1")))
    parser.add_argument("--nnodes", type=int, default=1)
    parser.add_argument("--node_rank", type=int,
                        default=int(os.environ.get("NODE_RANK", "0")))
    parser.add_argument("--master_addr",
                        default=os.environ.get("MASTER_ADDR", "127.0.0.1"))
    parser.add_argument("--master_port",
                        default=os.environ.get("MASTER_PORT", "29500"))
    parser.add_argument("--rdzv_backend", default="static",
                        help="rendezvous backend from the registry: "
                             "'static' (env-based ranks, the default), "
                             "'c10d' (TCPStore at --rdzv_endpoint), "
                             "'etcd' (etcd v3 gateway at --rdzv_endpoint), "
                             "or 'file' (--rdzv_endpoint is a shared path)")
    parser.add_argument("--rdzv_endpoint", default="",
                        help="host:port (c10d/etcd) or filesystem path (file)")
    parser.add_argument("--rdzv_id", default="editor_tpu_job")
    parser.add_argument("--min_nodes", type=int, default=None,
                        help="elastic lower bound (defaults to --nnodes)")
    parser.add_argument("--max_nodes", type=int, default=None,
                        help="elastic upper bound (defaults to --nnodes)")
    parser.add_argument("--max_restarts", type=int, default=3)
    parser.add_argument("--monitor_interval", type=float, default=1.0)
    parser.add_argument("--heartbeat_timeout", type=float, default=None)
    parser.add_argument("--error_dir", default="/tmp/editor_tpu_elastic")
    parser.add_argument("cmd", nargs=argparse.REMAINDER,
                        help="-- worker command line")
    args = parser.parse_args(argv)

    cmd = args.cmd
    if cmd and cmd[0] == "--":
        cmd = cmd[1:]
    if not cmd:
        parser.error("no worker command given (append: -- python your_script.py)")

    from editor_tpu.parallel.elastic import ElasticSupervisor, WorkerSpec

    node_rank, nnodes = args.node_rank, args.nnodes
    if args.rdzv_backend != "static":
        # negotiate node membership through the pluggable rendezvous
        # registry (reference torchrun --rdzv_backend,
        # distributed/run.py:383-401 over elastic/rendezvous/api.py): each
        # node-level launcher joins a round and receives its node rank +
        # the settled node count before spawning workers.
        from editor_tpu.parallel.rendezvous import (RendezvousParameters,
                                                    rendezvous_registry)
        # c10d server election is automatic ("auto"): the launcher that can
        # bind --rdzv_endpoint hosts the store, everyone else connects —
        # node ranks are an OUTPUT of the rendezvous, so they cannot gate
        # who serves (with the default node_rank=0 every node would try).
        handler = rendezvous_registry.create_handler(RendezvousParameters(
            backend=args.rdzv_backend, endpoint=args.rdzv_endpoint,
            run_id=args.rdzv_id,
            min_nodes=args.min_nodes or args.nnodes,
            max_nodes=args.max_nodes or args.nnodes))
        store, node_rank, nnodes = handler.next_rendezvous(timeout=60.0)
        print(f"rendezvous[{args.rdzv_backend}] settled: "
              f"node {node_rank}/{nnodes}")
        # node ranks are random-uuid-ordered, so the elected rank-0 node is
        # generally NOT the host named by --master_addr; the JAX coordinator
        # (parallel/multihost.py) must live on rank 0 — publish its address
        # through the store (round-scoped key: reused run_ids on a
        # persistent store must not see a previous round's address).
        import socket
        rnd = getattr(handler, "last_round", 0)
        addr_key = f"rdzv/{args.rdzv_id}/master_addr/{rnd}"
        if node_rank == 0:
            # FQDN: short container hostnames are often not DNS-resolvable
            # from peer nodes (torch elastic publishes the fqdn too). But
            # getfqdn() returns 'localhost' when reverse DNS maps the host
            # to 127.0.0.1 — useless to peers, so fall back to the hostname.
            fqdn = socket.getfqdn()
            if not fqdn or fqdn == "localhost" or fqdn.startswith("localhost."):
                fqdn = socket.gethostname()
            args.master_addr = fqdn
            store.set(addr_key, args.master_addr)
        else:
            args.master_addr = store.wait(addr_key, timeout=60.0)
        print(f"coordinator (rank-0 node): {args.master_addr}")

    # single supervisor per node; worker ranks offset by node_rank
    world = nnodes * args.nproc_per_node
    env = {
        "MASTER_ADDR": args.master_addr,
        "MASTER_PORT": str(args.master_port),
        "WORLD_SIZE": str(world),
        "NODE_RANK": str(node_rank),
        "NPROC_PER_NODE": str(args.nproc_per_node),
    }
    spec = WorkerSpec(
        argv=cmd,
        nproc=args.nproc_per_node,
        max_restarts=args.max_restarts,
        monitor_interval=args.monitor_interval,
        heartbeat_timeout=args.heartbeat_timeout,
        env=env,
        error_dir=args.error_dir,
    )

    # per-worker RANK derives from LOCAL_RANK (set by the supervisor) at the
    # worker side: RANK = NODE_RANK * nproc + LOCAL_RANK
    sup = ElasticSupervisor(spec)
    restarts = sup.run()
    print(f"launch complete; restarts used: {restarts}")
    return restarts


if __name__ == "__main__":
    sys.exit(0 if main() is not None else 1)

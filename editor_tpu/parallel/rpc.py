"""Host-side RPC control plane.

reference: distributed/rpc/ (init_rpc :77, rpc_sync :697, rpc_async :769,
remote :485 returning RRefs, shutdown :286; RemoteModule nn/api/
remote_module.py:111; DistributedOptimizer optim/optimizer.py:129).

Role in the TPU-native design: the reference uses RPC as its *model-parallel
substrate* (tensors move between workers through TensorPipe). On TPU that
data plane is jit+sharding over the mesh — RPC remains useful only as a
lightweight HOST control plane (orchestration, metrics, eval fan-out,
parameter-server experiments), so this is a compact TCP/pickle
implementation of the same API surface: sync/async calls, owner-side
references (RRef), remote modules, and a distributed optimizer that steps
owner-side optimizers under a single barrier (the reference's dist-autograd
context is unnecessary — JAX gradients are computed SPMD, not RPC-threaded).

Security note: pickle over TCP — trusted-cluster use only, same trust model
as the reference's TensorPipe agent.
"""

from __future__ import annotations

import concurrent.futures
import socket

import cloudpickle as pickle  # lambdas/closures cross the wire (trusted cluster)
import socketserver
import struct
import threading
import time
import uuid
from typing import Any, Callable, Dict, Optional, Tuple

_STATE: Dict[str, Any] = {}


def _send_msg(sock: socket.socket, obj: Any) -> None:
    data = pickle.dumps(obj)
    sock.sendall(struct.pack("!I", len(data)) + data)


def _recv_msg(sock: socket.socket) -> Any:
    hdr = b""
    while len(hdr) < 4:
        chunk = sock.recv(4 - len(hdr))
        if not chunk:
            raise ConnectionError("peer closed")
        hdr += chunk
    (n,) = struct.unpack("!I", hdr)
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(min(65536, n - len(buf)))
        if not chunk:
            raise ConnectionError("peer closed")
        buf += chunk
    return pickle.loads(buf)


class _Handler(socketserver.BaseRequestHandler):
    def handle(self):
        try:
            msg = _recv_msg(self.request)
        except ConnectionError:
            return
        kind = msg["kind"]
        if kind == "call":
            try:
                fn = msg["fn"]
                t0 = time.perf_counter()
                result = fn(*msg["args"], **msg["kwargs"])
                prof = _STATE.get("profile")
                if prof is not None:
                    with _STATE["lock"]:
                        prof.append({
                            "name": getattr(fn, "__qualname__",
                                            getattr(fn, "__name__", "<fn>")),
                            "duration_s": time.perf_counter() - t0,
                            "thread": threading.get_ident(),
                        })
                if msg.get("store_as"):
                    _STATE["objects"][msg["store_as"]] = result
                    _send_msg(self.request, {"ok": True, "value": None})
                else:
                    _send_msg(self.request, {"ok": True, "value": result})
            except Exception as e:  # noqa: BLE001
                _send_msg(self.request, {"ok": False, "error": repr(e)})
        elif kind == "fetch":
            obj = _STATE["objects"].get(msg["key"])
            _send_msg(self.request, {"ok": True, "value": obj})
        elif kind == "register":
            with _STATE["lock"]:
                _STATE["peers"][msg["name"]] = msg["addr"]
                _STATE["ranks"][msg["rank"]] = msg["name"]
            _send_msg(self.request, {"ok": True,
                                     "peers": dict(_STATE["peers"]),
                                     "ranks": dict(_STATE["ranks"])})
        elif kind == "peers":
            _send_msg(self.request, {"ok": True,
                                     "peers": dict(_STATE["peers"]),
                                     "ranks": dict(_STATE["ranks"])})
        elif kind == "shutdown":
            _send_msg(self.request, {"ok": True})
            threading.Thread(target=_STATE["server"].shutdown,
                             daemon=True).start()


class _Server(socketserver.ThreadingTCPServer):
    allow_reuse_address = True
    daemon_threads = True


def init_rpc(name: str, rank: int, world_size: int,
             master_addr: str = "127.0.0.1", master_port: int = 29631,
             timeout: float = 30.0) -> None:
    """init_rpc equivalent (rpc/__init__.py:77): start the local server and
    rendezvous the peer table through rank 0."""
    server = _Server(("127.0.0.1", 0), _Handler)
    addr = server.server_address
    _STATE.update({
        "name": name, "rank": rank, "world_size": world_size,
        "server": server, "addr": addr, "objects": {}, "peers": {name: addr},
        "ranks": {rank: name}, "lock": threading.Lock(),
        "pool": concurrent.futures.ThreadPoolExecutor(max_workers=8),
        "master": (master_addr, master_port),
    })
    threading.Thread(target=server.serve_forever, daemon=True).start()

    if rank == 0:
        master = _Server((master_addr, master_port), _Handler)
        _STATE["master_server"] = master
        threading.Thread(target=master.serve_forever, daemon=True).start()

    # register with the master and poll until all peers joined
    deadline = time.time() + timeout
    while time.time() < deadline:
        try:
            with socket.create_connection((master_addr, master_port),
                                          timeout=2) as s:
                _send_msg(s, {"kind": "register", "name": name, "addr": addr,
                              "rank": rank})
                reply = _recv_msg(s)
            _STATE["peers"].update(reply["peers"])
            _STATE["ranks"].update(reply["ranks"])
            if len(_STATE["peers"]) >= world_size:
                return
        except (ConnectionError, OSError):
            pass
        time.sleep(0.1)
    raise TimeoutError(f"rpc rendezvous incomplete: {_STATE['peers']}")


def _resolve(to) -> Tuple[str, int]:
    peers = _STATE["peers"]
    if isinstance(to, int):
        to = _STATE["ranks"][to]
    if to not in peers:
        # refresh from master
        with socket.create_connection(_STATE["master"], timeout=5) as s:
            _send_msg(s, {"kind": "peers"})
            reply = _recv_msg(s)
        _STATE["peers"].update(reply["peers"])
        _STATE["ranks"].update(reply["ranks"])
    return tuple(_STATE["peers"][to])


class FaultyRPCError(ConnectionError):
    """Raised when fault injection drops an outgoing message."""


def enable_fault_injection(messages_to_fail: Tuple[str, ...] = ("call",),
                           messages_to_delay: Optional[Dict[str, float]] = None,
                           num_fail_sends: int = 1) -> None:
    """Test-only fault injection, mirroring the reference's faulty
    TensorPipe agent (rpc/_testing/faulty_agent_backend_registry.py:30-60):
    the first ``num_fail_sends`` sends of each kind in ``messages_to_fail``
    are dropped (raise FaultyRPCError); kinds in ``messages_to_delay`` are
    delayed by the given seconds before sending."""
    _STATE["faults"] = {
        "fail": {k: num_fail_sends for k in messages_to_fail},
        "delay": dict(messages_to_delay or {}),
    }


def disable_fault_injection() -> None:
    _STATE.pop("faults", None)


def _maybe_inject_fault(kind: str) -> None:
    faults = _STATE.get("faults")
    if not faults:
        return
    delay = faults["delay"].get(kind)
    if delay:
        time.sleep(delay)
    remaining = faults["fail"].get(kind, 0)
    if remaining > 0:
        faults["fail"][kind] = remaining - 1
        raise FaultyRPCError(f"injected drop of '{kind}' message "
                             f"({remaining - 1} drops remaining)")


def _roundtrip(addr, msg, retries: int = 0):
    """One request/response. ``retries`` re-sends after injected (or real)
    connection failures — the reference retries RREF fetches but not user
    calls (rpc/_testing: FAULTY_MESSAGES vs retryable message types)."""
    attempt = 0
    while True:
        try:
            _maybe_inject_fault(msg["kind"])
            with socket.create_connection(addr, timeout=60) as s:
                _send_msg(s, msg)
                reply = _recv_msg(s)
            break
        except (ConnectionError, OSError):
            if attempt >= retries:
                raise
            attempt += 1
            time.sleep(0.05 * attempt)
    if not reply["ok"]:
        raise RuntimeError(f"remote raised: {reply['error']}")
    return reply["value"]


def rpc_sync(to, fn: Callable, args: tuple = (), kwargs: Optional[dict] = None):
    """rpc_sync (rpc/api.py:697)."""
    return _roundtrip(_resolve(to), {"kind": "call", "fn": fn, "args": args,
                                     "kwargs": kwargs or {}})


def rpc_async(to, fn: Callable, args: tuple = (),
              kwargs: Optional[dict] = None):
    """rpc_async (rpc/api.py:769) — returns a concurrent Future."""
    return _STATE["pool"].submit(rpc_sync, to, fn, args, kwargs)


class RRef:
    """Owner-side reference (rpc/api.py:485 remote)."""

    def __init__(self, owner, key: str):
        self.owner = owner
        self.key = key

    def to_here(self):
        # rref fetches are retried through injected faults (the reference's
        # faulty agent marks RREF messages retryable; user calls are not)
        return _roundtrip(_resolve(self.owner), {"kind": "fetch",
                                                 "key": self.key}, retries=3)

    def rpc_sync_method(self, fn: Callable, *args, **kwargs):
        """Run fn(owner_value, *args) on the owner, replacing the value."""
        key = self.key

        def apply(*a, _key=key, _fn=fn, **kw):
            import editor_tpu.parallel.rpc as R
            val = R._STATE["objects"][_key]
            out = _fn(val, *a, **kw)
            R._STATE["objects"][_key] = out
            return None

        return rpc_sync(self.owner, apply, args, kwargs)


def remote(to, fn: Callable, args: tuple = (),
           kwargs: Optional[dict] = None) -> RRef:
    key = f"rref-{uuid.uuid4().hex}"
    _roundtrip(_resolve(to), {"kind": "call", "fn": fn, "args": args,
                              "kwargs": kwargs or {}, "store_as": key})
    return RRef(to, key)


class server_process_global_profile:
    """Profile every RPC handled by this process's server across ALL its
    threads (reference rpc/server_process_global_profiler.py:14): a context
    manager collecting per-call events; ``events()`` returns them and
    ``key_averages()`` aggregates count/total/mean duration per function."""

    def __enter__(self):
        with _STATE["lock"]:
            _STATE["profile"] = []
        return self

    def __exit__(self, *exc):
        with _STATE["lock"]:
            self._events = list(_STATE.pop("profile", []))
        return False

    def events(self):
        return list(self._events)

    def key_averages(self):
        agg: Dict[str, Dict[str, float]] = {}
        for e in self._events:
            a = agg.setdefault(e["name"], {"count": 0, "total_s": 0.0})
            a["count"] += 1
            a["total_s"] += e["duration_s"]
        for a in agg.values():
            a["mean_s"] = a["total_s"] / a["count"]
        return agg


def shutdown() -> None:
    """Graceful shutdown (rpc/api.py:286)."""
    if "server" in _STATE:
        _STATE["server"].shutdown()
    if "master_server" in _STATE:
        _STATE["master_server"].shutdown()
    pool = _STATE.get("pool")
    if pool:
        pool.shutdown(wait=False)


# ---------------------------------------------------------------------------
# RemoteModule + DistributedOptimizer (nn/api/remote_module.py:111,
# optim/optimizer.py:129)
# ---------------------------------------------------------------------------

class RemoteModule:
    """A (params, apply_fn) pair living on a remote worker; forward via RPC."""

    def __init__(self, on, init_fn: Callable, apply_fn: Callable):
        self.on = on
        self.apply_fn = apply_fn
        self.params_rref = remote(on, init_fn)

    def forward(self, *args, **kwargs):
        rref_key = self.params_rref.key
        apply_fn = self.apply_fn

        def run(*a, _key=rref_key, _fn=apply_fn, **kw):
            import editor_tpu.parallel.rpc as R
            params = R._STATE["objects"][_key]
            return _fn(params, *a, **kw)

        return rpc_sync(self.on, run, args, kwargs)

    __call__ = forward


class DistributedOptimizer:
    """Steps per-owner optimizers over RRef-held params in one barrier."""

    def __init__(self, update_fn: Callable, param_rrefs):
        self.update_fn = update_fn
        self.param_rrefs = list(param_rrefs)

    def step(self, *step_args):
        futures = []
        for rref in self.param_rrefs:
            futures.append(_STATE["pool"].submit(
                rref.rpc_sync_method, self.update_fn, *step_args))
        for f in futures:
            f.result()

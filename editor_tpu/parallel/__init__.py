from editor_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    replicated,
    shard_batch,
)
from editor_tpu.parallel.collectives import (  # noqa: F401
    all_gather,
    all_reduce,
    all_to_all,
    barrier,
    broadcast,
    ppermute_shift,
    reduce_scatter,
)
from editor_tpu.parallel.compression import Reducer, make_reducer  # noqa: F401
from editor_tpu.parallel.zero import shard_opt_state, zero1_shardings  # noqa: F401
from editor_tpu.parallel.fsdp import (  # noqa: F401
    fsdp_shardings,
    param_memory_bytes,
    shard_params,
)
from editor_tpu.parallel.tp import (  # noqa: F401
    editor_tp_shardings,
    train_state_tp_shardings,
)
from editor_tpu.parallel.rendezvous import (  # noqa: F401
    DynamicRendezvous,
    FileStore,
    RendezvousClosedError,
    RendezvousHandler,
    RendezvousHandlerRegistry,
    RendezvousParameters,
    TCPStore,
    all_gather_object,
    broadcast_object,
    monitored_barrier,
    rendezvous_registry,
)
from editor_tpu.parallel.etcd import (  # noqa: F401
    EtcdServer,
    EtcdStore,
)
from editor_tpu.parallel.ring import (  # noqa: F401
    ring_attention,
    ulysses_attention,
)
from editor_tpu.parallel.moe import (  # noqa: F401
    MoEParams,
    moe_ffn,
    moe_ffn_dense,
    moe_init,
)

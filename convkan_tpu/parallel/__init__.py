from .mesh import make_mesh, data_sharding, replicate  # noqa: F401
from .pipeline import (  # noqa: F401
    PipelinedKanMLP, gpipe_apply, make_pipeline_mesh,
    pipeline_state_shardings)
from .moe import (  # noqa: F401
    KanMoE, expert_state_shardings, make_expert_mesh)

"""Dataset builders: LIVECell (COCO), EM volumes (MitoEM/VNC/Lucchi/UroCell),
Lung X-Ray folders."""

from .em import (
    get_lucchi_loader,
    get_mitoem_loader,
    get_uro_cell_loader,
    get_vnc_mito_loader,
)
from .livecell import (
    CELL_TYPES,
    compute_class_distribution,
    get_dual_livecell_loader,
    get_livecell_loader,
    get_my_livecell_loader,
)
from .lung import (
    LUNG_DOMAINS,
    get_jsrt_s1_loader,
    get_jsrt_s2_loader,
    get_lung_loader,
    get_montgomery_loader,
    get_nih_loader,
    prepare_montgomery,
    prepare_nih,
)

__all__ = [
    "CELL_TYPES",
    "LUNG_DOMAINS",
    "get_livecell_loader",
    "get_my_livecell_loader",
    "get_dual_livecell_loader",
    "compute_class_distribution",
    "get_mitoem_loader",
    "get_vnc_mito_loader",
    "get_lucchi_loader",
    "get_uro_cell_loader",
    "get_lung_loader",
    "get_jsrt_s1_loader",
    "get_jsrt_s2_loader",
    "get_nih_loader",
    "get_montgomery_loader",
    "prepare_montgomery",
    "prepare_nih",
]

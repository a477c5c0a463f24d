from emiproc_spark.operators.basic import (  # noqa: F401
    add_inventories,
    drop,
    get_total_emissions,
    group_categories,
    group_substances,
    scale_inventory,
    total_emissions_almost_equal,
)
from emiproc_spark.operators.speciation import (  # noqa: F401
    merge_substances,
    speciate,
    speciate_nox,
)

"""L5 — evaluation: test predictions, tables, figures, complexity."""

from dmel_tpu.eval.predict import predict_test, predictions_by_row  # noqa: F401
from dmel_tpu.eval.tables import (  # noqa: F401
    produce_table_1,
    produce_table_2,
    produce_result_table,
    get_model_title,
)
from dmel_tpu.eval.metrics import (  # noqa: F401
    average_precision,
    mean_average_precision,
    top1_precision,
)
from dmel_tpu.eval.figures import (  # noqa: F401
    produce_data_example_plot,
    produce_accuracy_plot,
    ACC_BANDS,
)
from dmel_tpu.eval.complexity import cost_ratio, produce_complexity_plot  # noqa: F401

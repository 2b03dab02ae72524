"""Config model, validation, schema retype, and the projection planner."""

from .config import ColumnConfig, TaskConfig, ConfigError  # noqa: F401
from .apply import (  # noqa: F401
    InvalidFlagPlan,
    apply_task,
    build_output_schema,
    invalid_condition,
    invalid_filter,
)

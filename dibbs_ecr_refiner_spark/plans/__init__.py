from .config import (  # noqa: F401
    KeepCode,
    MatchRule,
    RefinePlan,
    RoleInstruction,
    build_plan,
    normalize_policy,
)

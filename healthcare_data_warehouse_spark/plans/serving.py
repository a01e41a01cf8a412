"""Serving layer: the named-query service with privacy-budget and audit
enforcement.

Reference analog: the FastAPI/Streamlit endpoints (api.py, dashboard.py)
plus the privacy engine's session epsilon accounting
(privacy_engine.py:291-318). SURVEY.md §4 concluded both belong in the
query registry, not the planner — this module is that registry wrapper:

- every query execution appends a READ event to the audit log (S7);
- queries that spend differential-privacy budget must pre-charge epsilon
  and are refused once the session budget is exhausted;
- results can be capped (the API layer's parameterized LIMIT, O3).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from ..config import DP_EPSILON, PRIVACY_BUDGET_MAX_EPSILON
from ..operators.privacy import PrivacyBudget
from ..sources.audit import log_audit
from . import catalog

# Queries whose execution spends differential-privacy budget (they add
# Laplace noise derived from the session epsilon).
DP_QUERIES: dict[str, float] = {
    "fn_laplace_noise": DP_EPSILON,
    "privacy_noise_impact": DP_EPSILON,
}


class BudgetExhaustedError(Exception):
    pass


@dataclass
class QueryService:
    """Audited, budget-enforced access to the query catalog."""

    spark: SparkSession
    sf_dir: str
    user: str = "api_user"
    budget: PrivacyBudget = field(
        default_factory=lambda: PrivacyBudget(max_epsilon=PRIVACY_BUDGET_MAX_EPSILON)
    )

    def available_queries(self) -> list[str]:
        return sorted(catalog.queries())

    def run(self, name: str, limit: int | None = None) -> DataFrame:
        qs = catalog.queries()
        if name not in qs:
            raise KeyError(f"unknown query {name!r}; see available_queries()")
        epsilon = DP_QUERIES.get(name)
        if epsilon is not None and not self.budget.charge(name, epsilon):
            raise BudgetExhaustedError(
                f"epsilon budget exhausted (spent {self.budget.spent:.2f} of "
                f"{self.budget.max_epsilon}); refusing DP query {name!r}"
            )
        log_audit(self.spark, "READ", name, user_name=self.user,
                  details=f"sf_dir={self.sf_dir}" + (f" epsilon={epsilon}" if epsilon else ""))
        df = qs[name](self.spark, self.sf_dir)
        return df.limit(limit) if limit is not None else df

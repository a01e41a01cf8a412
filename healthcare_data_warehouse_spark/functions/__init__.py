from .expressions import (  # noqa: F401
    age_bucket,
    age_years,
    anonymize,
    balance_bucket,
    davg,
    dsum,
    laplace_noise,
    valid_record,
    visit_cohort,
    with_privacy_noise,
)

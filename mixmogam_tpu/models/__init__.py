"""High-level association models (reference: linear_models.py module-level
drivers emma / emmax / emmax_step_wise / linear_model / anova — SURVEY.md
§2.1). Each returns a plain dict of numpy arrays + scalars; the results
layer wraps them into Result objects."""

from mixmogam_tpu.models.emmax import emmax, emmax_anova
from mixmogam_tpu.models.linear import linear_model, anova, kruskal_wallis

__all__ = ["emmax", "emmax_anova", "linear_model", "anova", "kruskal_wallis"]

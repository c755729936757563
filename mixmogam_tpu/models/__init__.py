"""High-level association models (reference: linear_models.py module-level
drivers emma / emmax / emmax_step_wise / linear_model / anova — SURVEY.md
§2.1). Each returns a plain dict of numpy arrays + scalars; the results
layer wraps them into Result objects."""

from mixmogam_tpu.models.emmax import emmax, emmax_anova
from mixmogam_tpu.models.emma import emma
from mixmogam_tpu.models.linear import linear_model, anova, kruskal_wallis
from mixmogam_tpu.models.stepwise import emmax_step_wise
from mixmogam_tpu.models.multitrait import emmax_multi_trait
from mixmogam_tpu.models.permutation import emmax_perm_test
from mixmogam_tpu.models.resident import (ResidentGenome, emmax_resident,
                                          kinship_resident,
                                          rotate_resident_to_device)
from mixmogam_tpu.models.twosnp import emmax_two_snps
from mixmogam_tpu.models.loco import emmax_loco, loco_kinships
from mixmogam_tpu.models.gblup import (gblup, gblup_cv, gblup_predict,
                                       GblupModel)
from mixmogam_tpu.models.gxe import emmax_gxe

__all__ = ["emmax", "emmax_anova", "emma", "linear_model", "anova",
           "kruskal_wallis", "emmax_step_wise", "emmax_multi_trait",
           "emmax_perm_test", "emmax_two_snps", "ResidentGenome",
           "emmax_resident", "kinship_resident",
           "rotate_resident_to_device", "emmax_loco", "loco_kinships",
           "gblup", "gblup_cv", "gblup_predict", "GblupModel",
           "emmax_gxe"]

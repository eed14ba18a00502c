"""Pure-JAX adversarial attacks.

Reference parity: the cleverhans (~v2.x) attacks used by whitebox.py /
blackbox.py of kabkabm/defensegan — FastGradientMethod (FGSM), RAND+FGSM,
CarliniWagnerL2, and the Jacobian-augmentation black-box substitute pipeline.
All attacks here are jittable, run fully on-device, and accept a
`logits_fn(x) -> logits` closure; composing `logits_fn` with the defense's
differentiable reconstruction (back_prop=True) yields the white-box
attack-through-the-defense of the paper.

Beyond the reference's suite: PGD (pgd.py, Madry et al.) and BPDA
gradients (compose.py grad_mode="bpda", Athalye et al. 2018) — together
the canonical adaptive attack on purification defenses, with EOT-style
per-step restart keys against the stochastic defense — plus SPSA
(spsa.py, Uesato et al. 2018), the gradient-FREE adaptive attack that
needs no differentiable path at all and therefore attacks the defense
exactly as deployed (fast inference kernels included).
"""

from defensegan_tpu.attacks.fgsm import fgsm, rand_fgsm
from defensegan_tpu.attacks.pgd import make_chunked_pgd, pgd
from defensegan_tpu.attacks.cw import (CWConfig, carlini_wagner_l2,
                                       carlini_wagner_l2_chunked,
                                       effective_cw_chunk,
                                       make_chunked_cw)
from defensegan_tpu.attacks.blackbox import (jacobian_augmentation,
                                             train_substitute)
from defensegan_tpu.attacks.compose import (attack_batch_key, attack_z0_key,
                                            eot_over_keys,
                                            make_attack_loss,
                                            make_attack_target,
                                            split_rand_fgsm_key)
from defensegan_tpu.attacks.spsa import (confident_margin_loss,
                                          make_spsa, margin_loss)

__all__ = [
    "attack_batch_key",
    "attack_z0_key",
    "eot_over_keys",
    "make_attack_loss",
    "make_attack_target",
    "split_rand_fgsm_key",
    "fgsm",
    "rand_fgsm",
    "pgd",
    "make_chunked_pgd",
    "CWConfig",
    "carlini_wagner_l2",
    "carlini_wagner_l2_chunked",
    "effective_cw_chunk",
    "make_chunked_cw",
    "jacobian_augmentation",
    "train_substitute",
    "confident_margin_loss",
    "make_spsa",
    "margin_loss",
]

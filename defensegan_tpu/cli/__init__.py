"""CLI entry points mirroring the reference's repo-root scripts.

Reference parity: train.py / whitebox.py / blackbox.py of kabkabm/defensegan
(flag names kept: --cfg, --is_train, --attack_type, --defense_type, --model,
--bb_model, --sub_model, --fgsm_eps, --rec_iters, --rec_rr, --rec_lr,
--num_tests, --train_on_recs, --data_aug, --lmbda, ...).
"""

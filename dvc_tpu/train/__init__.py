from .trainer import (Trainer, multistep_lr, ss_prob_for_epoch,
                      step_prng_key,
                      save_checkpoint, load_checkpoint, filtered_restore,
                      save_info_json, load_info_json)

__all__ = ["Trainer", "multistep_lr", "ss_prob_for_epoch", "step_prng_key",
           "save_checkpoint",
           "load_checkpoint", "filtered_restore", "save_info_json",
           "load_info_json"]

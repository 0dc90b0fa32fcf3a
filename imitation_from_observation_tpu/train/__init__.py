from imitation_from_observation_tpu.train.trainer import TranslationTrainer, TrainState

__all__ = ["TranslationTrainer", "TrainState"]

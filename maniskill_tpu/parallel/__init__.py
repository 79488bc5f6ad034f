from .train import PPOConfig, make_train_step, make_sharded_ppo_step

from .cartpole import CartpoleBalanceEnv, CartpoleSwingUpEnv

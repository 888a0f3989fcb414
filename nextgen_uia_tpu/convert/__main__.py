from .torch_to_jax import main

main()

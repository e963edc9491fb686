from pqp_for_mpc_tpu.io.example_loader import (  # noqa: F401
    load_example_dir,
    write_example_dir,
)
from pqp_for_mpc_tpu.io.generator import (  # noqa: F401
    GeneratedQP,
    generate_instance,
    read_generator_file,
    write_generator_file,
)

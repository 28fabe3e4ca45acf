from deepaco_tpu.cli import main

main()

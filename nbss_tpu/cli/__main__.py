from nbss_tpu.cli.main import main

main()

from ragmeup_tpu.server.app import main

main()

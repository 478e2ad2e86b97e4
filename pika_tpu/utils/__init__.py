from pika_tpu.utils.logger import Logger

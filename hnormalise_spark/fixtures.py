"""Golden fixture corpus, transcribed from the reference's test suite.

Each entry: (fixture_id, family, parser, raw syslog line). Message
bodies are verbatim from /root/reference/test/HNormalise/*/ParserSpec.hs
and test/Bench.hs (cited per entry); where the hspec test exercises a
bare message, a deterministic envelope is prepended in the reference's
logstash template (Parser.hs:62).

These drive both the pytest goldens and the synthetic corpus generator
(datagen.py), which parameterizes them deterministically at scale.
"""

from __future__ import annotations

ENV = "<133>1 2017-05-24T18:01:53.367275+02:00 {host} {tag} - {msg}"


def wrap(msg: str, host: str = "test2802", tag: str = "daemon:") -> str:
    return ENV.format(host=host, tag=tag, msg=msg)


# --- torque (test/HNormalise/Torque/ParserSpec.hs; test/Bench.hs:57-64) ---
TORQUE_EXIT_FQDN = (  # ParserSpec.hs:417-503 / Bench.hs:57
    "torque: 04/05/2017 13:06:53;E;45.mymaster.somecluster.somedomain;"
    "user=vsc40075 group=vsc40075 jobname=STDIN queue=short ctime=1491390300 "
    "qtime=1491390300 etime=1491390300 start=1491390307 "
    "owner=vsc40075@submitnode01.submitnode.somedomain "
    "exec_host=node2801.somecluster.somedomain/0-1+node2803.somecluster.somedomain/0-1 "
    "Resource_List.nodes=node2801.somecluster.somedomain:ppn=2+node2803.somecluster.somedomain:ppn=2 "
    "Resource_List.vmem=1gb Resource_List.nodect=2 "
    "Resource_List.neednodes=node2801.somecluster.somedomain:ppn=2+node2803.somecluster.somedomain:ppn=2 "
    "Resource_List.nice=0 Resource_List.walltime=01:00:00 session=15273 "
    "total_execution_slots=4 unique_node_count=2 end=1491390413 Exit_status=0 "
    "resources_used.cput=0 resources_used.energy_used=0 resources_used.mem=55048kb "
    "resources_used.vmem=92488kb resources_used.walltime=00:01:44"
)

TORQUE_EXIT_2014_ARRAY = (  # ParserSpec.hs:505-573 (same-host merge + [0..15])
    "torque: 01/12/2014 23:57:07;E;161299[389].mymaster.somecluster.somedomain;"
    "user=vsc40909 group=vsc40909 jobname=30by40XconChoicesResults-389 queue=short "
    "ctime=1389546423 qtime=1389546423 etime=1389546423 start=1389567229 "
    "owner=vsc40909@submitnode02.submitnode.somedomain "
    "exec_host=" + "+".join(f"node2135.somecluster.somedomain/{i}" for i in range(16)) + " "
    "Resource_List.neednodes=1:ppn=16 Resource_List.nice=0 Resource_List.nodect=1 "
    "Resource_List.nodes=1:ppn=16 Resource_List.vmem=74737mb Resource_List.walltime=05:00:00 "
    "session=32698 end=1389567427 Exit_status=0 resources_used.cput=00:48:40 "
    "resources_used.mem=307504kb resources_used.vmem=1985904kb resources_used.walltime=00:03:21"
)

TORQUE_EXIT_CPUT = (  # ParserSpec.hs:575-633 (Resource_List.cput)
    "torque: 07/22/2014 11:00:03;E;621344.master15.delcatty.gent.vsc;"
    "user=vsc40035 group=vsc40035 jobname=NB03N queue=long ctime=1406019524 "
    "qtime=1406019524 etime=1406019524 start=1406019532 owner=vsc40035@gligar03.gligar.gent.vsc "
    "exec_host=" + "+".join(f"node2142.delcatty.gent.vsc/{i}" for i in range(16)) + " "
    "Resource_List.cput=72:00:00 Resource_List.neednodes=1:ppn=16 Resource_List.nice=0 "
    "Resource_List.nodect=1 Resource_List.nodes=1:ppn=16 Resource_List.vmem=74737mb "
    "Resource_List.walltime=72:00:00 session=117962 end=1406019603 Exit_status=271 "
    "resources_used.cput=00:00:25 resources_used.mem=5316kb resources_used.vmem=78756kb "
    "resources_used.walltime=00:01:14"
)

TORQUE_EXIT_ACCOUNT = (  # ParserSpec.hs:635-690 (account + signed Exit_status)
    "torque: 08/03/2017 05:07:22;E;268279.master21.swalot.gent.vsc;"
    "user=vsc41771 group=vsc41771 account=lt1_2017-43 "
    "jobname=/user/scratch/gent/gvo000/gvo00003/vsc41771/amsterdam/restrained_md/test_withoutplumed "
    "queue=short ctime=1501686015 qtime=1501686015 etime=1501686015 start=1501686467 "
    "owner=vsc41771@gligar01.gligar.gent.vsc "
    "exec_host=node2612.swalot.gent.vsc/0-19+node2681.swalot.gent.vsc/0-19 "
    "Resource_List.neednodes=2:ppn=20 Resource_List.nice=0 Resource_List.nodect=2 "
    "Resource_List.nodes=2:ppn=20 Resource_List.vmem=143425316860b "
    "Resource_List.walltime=11:59:00 session=7473 total_execution_slots=40 "
    "unique_node_count=2 end=1501729642 Exit_status=-11 resources_used.cput=1725002 "
    "resources_used.energy_used=0 resources_used.mem=16209816kb "
    "resources_used.vmem=38821964kb resources_used.walltime=11:59:30"
)

TORQUE_QUEUE = "torque: 06/28/2017 14:31:09;Q;80.mymaster.somecluster.somedomain;queue=default"  # :694-700
TORQUE_QUEUE_EMPTY_ARRAY = "torque: 12/31/2014 15:51:48;Q;1166970[].somemaster.somecluster.gent.vsc;queue=long"  # :712-718
TORQUE_DELETE = (  # :722-728
    "torque: 06/28/2017 15:44:02;D;81.mymaster.somecluster.somedomain;"
    "requestor=vsc40075@submitnode02.submitnode.somedomain"
)
TORQUE_ABORT = "torque: 09/02/2013 17:34:26;A;34106.mymaster.somecluster.somedomain;"  # :732-737
TORQUE_RERUN = "torque: 09/02/2013 17:34:26;R;34106.mymaster.somecluster.somedomain;"  # :741-746
TORQUE_START = (  # :751-809 / Bench.hs:64 (out-of-order Resource_List)
    "torque: 06/20/2017 11:24:49;S;63.mymaster.somecluster.somedomain;"
    "user=vsc40075 group=vsc40075 jobname=STDIN queue=short ctime=1497950675 "
    "qtime=1497950675 etime=1497950675 start=1497950689 "
    "owner=vsc40075@submitnode01.submitnode.somedomain "
    "exec_host=node2801.somecluster.somedomain/0 Resource_List.vmem=4224531456b "
    "Resource_List.nodes=1:ppn=1 Resource_List.walltime=00:10:00 Resource_List.nodect=1 "
    "Resource_List.neednodes=1:ppn=1 Resource_List.nice=0"
)
TORQUE_START_2009 = (  # :810-850 (FQDN neednodes without ppn)
    "torque: 02/23/2009 11:48:35;S;102355.master.cvos.cluster;"
    "user=vsc40014 group=vsc40014 jobname=MtChr5_9036000_rmwrap.sh queue=short_eth "
    "ctime=1235384686 qtime=1235384686 etime=1235384686 start=1235386115 "
    "owner=vsc40014@gengar1.cvos.cluster exec_host=node047.cvos.cluster/4 "
    "Resource_List.neednodes=node047.cvos.cluster Resource_List.nice=0 "
    "Resource_List.nodect=1 Resource_List.nodes=1 Resource_List.walltime=01:00:00"
)
TORQUE_BORKED = (  # test/Bench.hs:60 — must route to failure
    "torque: 04/05/2017 13:06:53;E;45.master23.banette.gent.vsc;"
    "user=vsc40075 group=vsc40075 jobname=STDIN queue=short HUPPEL"
)

# --- lmod (test/HNormalise/Lmod/ParserSpec.hs) ---
LMOD_LOAD_TORQUE = (  # :94-112
    "lmod::  username=myuser, cluster=mycluster, jobid=3230905.master.mycluster.mydomain, "
    "userload=yes, module=GSL/2.3-intel-2016b, "
    "fn=/apps/gent/CO7/sandybridge/modules/all/GSL/2.3-intel-2016b"
)
LMOD_LOAD_SLURM = (  # :114-128
    "lmod::  username=myuser, cluster=mycluster, jobid=3230905, userload=yes, "
    "module=GSL/2.3-intel-2016b, fn=/apps/gent/CO7/sandybridge/modules/all/GSL/2.3-intel-2016b"
)
LMOD_LOAD_EMPTY_JOBID = (  # :76-90 (empty jobid → null; dot-version module)
    "lmod::  username=myuser, cluster=mycluster, jobid=, userload=no, "
    "module=cluster/.mycluster, fn=/etc/modulefiles/vsc/cluster/.mycluster.lua"
)
LMOD_COMMAND = (  # :131-146
    "lmod::  username=myuser, cluster=mycluster, jobid=132.mymaster.mycluster.mydomain, "
    "cmd=load, args=cluster/othercluster"
)

# --- shorewall (test/HNormalise/Shorewall/ParserSpec.hs) ---
SHOREWALL_TCP = (  # :75-87
    "kernel:: Shorewall:ext2fw:REJECT:IN=em3 OUT= "
    "MAC=aa:aa:bb:ff:88:bc:bc:15:80:8b:f8:f8:80:00 SRC=78.0.0.1 DST=150.0.0.1 "
    "LEN=52 TOS=0x00 PREC=0x00 TTL=117 ID=7564 DF PROTO=TCP SPT=60048 DPT=22 "
    "WINDOW=65535 RES=0x00 SYN URGP=0"
)
SHOREWALL_UDP = (  # :60-72
    "kernel:: Shorewall:ipmi2int:REJECT:IN=em4 OUT=em1 SRC=10.0.0.2 DST=10.0.0.1 "
    "LEN=57 TOS=0x00 PREC=0x00 TTL=63 ID=62392 PROTO=UDP SPT=57002 DPT=53 LEN=37"
)
SHOREWALL_ICMP = (  # :89-102
    "kernel:: Shorewall:ipmi2ext:REJECT:IN=em4 OUT=em3 SRC=10.0.0.2 DST=10.0.0.1 "
    "LEN=28 TOS=0x00 PREC=0x00 TTL=63 ID=36216 PROTO=ICMP TYPE=8 CODE=0 ID=0 SEQ=1421"
)

# --- snoopy (test/HNormalise/Snoopy/ParserSpec.hs) ---
SNOOPY_PLAIN = (  # :60-70
    "snoopy[27316]::  [uid:110 sid:9379 tty:(none) cwd:/ "
    "filename:/usr/lib64/nagios/plugins/hpc/check_ifutil.pl]: "
    "/usr/lib64/nagios/plugins/hpc/check_ifutil.pl -i em1.295 -w 90 -c 95 -p -b 10000m"
)
SNOOPY_USERNAME = (  # :86-96
    "snoopy[28949]::  [uid:992 username:nrpe sid:11542 tty:(none) cwd:/ "
    "filename:/usr/bin/which]: which python"
)

# --- end-to-end full syslog lines (test/HNormalise/ParserSpec.hs:58-92) ---
E2E_LMOD_LOAD = (
    "<13>1 2016-06-07T17:50:22.658452+02:00 node2159 lmod: - lmod:: "
    "username=myuser, cluster=dmycluster, jobid=434.master.mycluster.mydomain, "
    "userload=yes, module=intel/2016a, fn=/apps/gent/SL6/sandybridge/modules/all/intel/2016"
)
E2E_LMOD_CMD = (
    "<13>1 2017-10-19T21:38:22.533439+02:00 node2801 lmod: - lmod::  "
    "username=myuser, cluster=mycluster, jobid=132.mymaster.mycluster.mydomain, "
    "cmd=load, args=cluster/othercluster"
)
E2E_LMOD_SLURM = (
    "<13>1 2019-05-22T10:57:11.522081+02:00 node2627 lmod: - lmod::  "
    "username=someuser, cluster=mycluster, jobid=32018161, userload=yes, "
    "module=Python/3.6.4-intel-2018a, "
    "fn=/somepath/eb_phanpyscratch/CO7/haswell-ib/modules/all/Python/3.6.4-intel-2018a.lua"
)
E2E_TORQUE_EXIT = (
    "<133>1 2017-05-24T18:01:53.367275+02:00 test2802 torque - torque: "
    "01/25/2017 15:04:10;E;0.mymaster.somepokemon.mydomain;user=huppelde group=huppelde "
    "jobname=STDIN queue=short ctime=1485350399 qtime=1485350399 etime=1485350399 "
    "start=1485350407 owner=huppelde@mymachine.mydomain.com "
    "exec_host=node2801.somepokemon.mydomain/0 Resource_List.walltime=01:00:00 "
    "Resource_List.vmem=4224531456b Resource_List.nodect=1 Resource_List.nodes=1 "
    "Resource_List.neednodes=1 Resource_List.nice=0 session=22598 "
    "total_execution_slots=1 unique_node_count=1 end=1485353050 Exit_status=265 "
    "resources_used.cput=0 resources_used.energy_used=0 resources_used.mem=31032kb "
    "resources_used.vmem=1541612kb resources_used.walltime=00:44:04"
)
E2E_TORQUE_ABORT = (
    "<133>1 2017-09-14T21:13:09.181048+02:00 master15 torque - torque: "
    "10/17/2013 02:46:14;A;86264.master15.delcatty.gent.vsc;\n"
)
E2E_SNOOPY = (
    "<86>1 2017-05-29T16:40:48.275334+02:00 mymaster snoopy[28949]: - snoopy[28949]::  "
    "[uid:992 username:nrpe sid:11542 tty:(none) cwd:/ filename:/usr/bin/which]: which python"
)

# --- slurm accounting (north-star family — no reference counterpart;
# record shape per the public Slurm jobcomp/filetxt plugin) ---
SLURM_COMPLETED = (
    "slurmctld: JobId=20746 UserId=alice(1000) GroupId=astro(1000) "
    "Name=train_lm JobState=COMPLETED Partition=gpu TimeLimit=720 "
    "StartTime=2024-03-01T08:15:00 EndTime=2024-03-01T11:45:30 "
    "NodeList=node[2801-2803,2810] NodeCnt=4 ProcCnt=128 WorkDir=/scratch/alice/run1"
)
SLURM_CANCELLED_BY = (  # the one space-containing value filetxt writes
    "slurmctld: JobId=20747 UserId=bob(1001) GroupId=bio(2002) "
    "Name=assembly JobState=CANCELLED by 1000 Partition=long TimeLimit=UNLIMITED "
    "StartTime=2024-03-02T00:00:00 EndTime=2024-03-02T00:05:00 "
    "NodeList=gpunode07,cpunode[01-02] NodeCnt=3 ProcCnt=96 WorkDir=/home/bob"
)
SLURM_NODE_FAIL_NULL = (  # job that never ran: (null) hostlist, zero counts
    "slurmctld: JobId=20748 UserId=carol(1002) GroupId=ml(2003) "
    "Name=sweep_7 JobState=NODE_FAIL Partition=batch TimeLimit=60 "
    "StartTime=2024-03-03T12:00:00 EndTime=2024-03-03T12:00:00 "
    "NodeList=(null) NodeCnt=0 ProcCnt=0 WorkDir=/home/carol"
)
SLURM_BORKED = (  # UserId without (uid) → parse failure
    "slurmctld: JobId=20749 UserId=mallory Name=x JobState=COMPLETED "
    "Partition=gpu TimeLimit=1 StartTime=2024-03-04T00:00:00 "
    "EndTime=2024-03-04T00:01:00 NodeList=n1 NodeCnt=1 ProcCnt=1"
)

# fixture corpus rows: (id, source, parser-or-None, full syslog line)
CORPUS: list[tuple[str, str, str | None, str]] = [
    ("tq-exit-fqdn", "torque", "torque_exit", wrap(TORQUE_EXIT_FQDN, tag="torque")),
    ("tq-exit-2014-array", "torque", "torque_exit", wrap(TORQUE_EXIT_2014_ARRAY, tag="torque")),
    ("tq-exit-cput", "torque", "torque_exit", wrap(TORQUE_EXIT_CPUT, tag="torque")),
    ("tq-exit-account", "torque", "torque_exit", wrap(TORQUE_EXIT_ACCOUNT, tag="torque")),
    ("tq-queue", "torque", "torque_queue", wrap(TORQUE_QUEUE, tag="torque")),
    ("tq-queue-empty-array", "torque", "torque_queue", wrap(TORQUE_QUEUE_EMPTY_ARRAY, tag="torque")),
    ("tq-delete", "torque", "torque_delete", wrap(TORQUE_DELETE, tag="torque")),
    ("tq-abort", "torque", "torque_abort", wrap(TORQUE_ABORT, tag="torque")),
    ("tq-rerun", "torque", "torque_rerun", wrap(TORQUE_RERUN, tag="torque")),
    ("tq-start", "torque", "torque_start", wrap(TORQUE_START, tag="torque")),
    ("tq-start-2009", "torque", "torque_start", wrap(TORQUE_START_2009, tag="torque")),
    ("tq-borked", "torque", None, wrap(TORQUE_BORKED, tag="torque")),
    ("lm-load-torque", "lmod", "lmod_load", wrap(LMOD_LOAD_TORQUE, tag="lmod:")),
    ("lm-load-slurm", "lmod", "lmod_load", wrap(LMOD_LOAD_SLURM, tag="lmod:")),
    ("lm-load-empty-jobid", "lmod", "lmod_load", wrap(LMOD_LOAD_EMPTY_JOBID, tag="lmod:")),
    ("lm-cmd", "lmod", "lmod_command", wrap(LMOD_COMMAND, tag="lmod:")),
    ("sw-tcp", "shorewall", "shorewall_tcp", wrap(SHOREWALL_TCP, tag="kernel:")),
    ("sw-udp", "shorewall", "shorewall_udp", wrap(SHOREWALL_UDP, tag="kernel:")),
    ("sw-icmp", "shorewall", "shorewall_icmp", wrap(SHOREWALL_ICMP, tag="kernel:")),
    ("su-completed", "slurm", "slurm_accounting", wrap(SLURM_COMPLETED, tag="slurmctld:")),
    ("su-cancelled-by", "slurm", "slurm_accounting", wrap(SLURM_CANCELLED_BY, tag="slurmctld:")),
    ("su-nodefail-null", "slurm", "slurm_accounting", wrap(SLURM_NODE_FAIL_NULL, tag="slurmctld:")),
    ("su-borked", "slurm", None, wrap(SLURM_BORKED, tag="slurmctld:")),
    ("sn-plain", "snoopy", "snoopy", wrap(SNOOPY_PLAIN, tag="snoopy[27316]:")),
    ("sn-username", "snoopy", "snoopy", wrap(SNOOPY_USERNAME, tag="snoopy[28949]:")),
    ("e2e-lmod-load", "lmod", "lmod_load", E2E_LMOD_LOAD),
    ("e2e-lmod-cmd", "lmod", "lmod_command", E2E_LMOD_CMD),
    ("e2e-lmod-slurm", "lmod", "lmod_load", E2E_LMOD_SLURM),
    ("e2e-torque-exit", "torque", "torque_exit", E2E_TORQUE_EXIT),
    ("e2e-torque-abort", "torque", "torque_abort", E2E_TORQUE_ABORT),
    ("e2e-snoopy", "snoopy", "snoopy", E2E_SNOOPY),
    # failure corpus (FIXTURES.md §2: any unmatched line → failure sink)
    ("junk-random", "junk", None, "some random text that is not syslog"),
    ("junk-sshd", "junk", None, wrap("sshd[123]: Accepted publickey for root", tag="sshd")),
    ("junk-empty", "junk", None, ""),
    ("junk-truncated-torque", "junk", None, wrap("torque: 04/05/2017 13:06:53;E;45.master", tag="torque")),
    ("junk-bare-jobid", "junk", None, wrap("torque: 04/05/2017 13:06:53;Q;123456;queue=q", tag="torque")),
]
